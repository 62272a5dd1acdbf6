package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Incremental (batch-vs-corpus) dedup semantics. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = (1 to 30).map(i => s"tok$i").mkString(" ")

  test("exact tier claims identical content; near tier the rest; corpus pairs excluded") {
    val corpus = Seq(
      (1L, base), // exact twin of batch 101
      (2L, base + " tail extra"), // near-dup of batch 102 and of corpus 1
      (3L, (1 to 30).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val batch = Seq(
      (101L, base), // == corpus 1
      (102L, base + " tail"), // near corpus 1 and 2
      (103L, (1 to 30).map(i => s"novel$i").mkString(" ")) // matches nothing
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(corpus, batch, "doc_id", "text",
        shingleN = 3, numHashes = 16, rowsPerBand = 8, threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .toSet
    // the identical pair is EXACT, and not double-reported as near
    assert(out.count { case (a, b, _) => a == 101L && b == 1L } == 1)
    assert(out.contains((101L, 1L, "exact")))
    // near-dups across the boundary are found
    assert(out.contains((102L, 1L, "near")) || out.contains((102L, 2L, "near")))
    // batch doc with no counterpart stays silent
    assert(!out.exists(_._1 == 103L))
    // corpus×corpus near-dups (1 vs 2) are NOT this operator's job
    assert(!out.exists { case (a, b, _) => a <= 100L && b <= 100L })
  }

  test("near jaccard values match the symmetric pipeline's for the same pair") {
    val corpus = Seq((1L, base + " x y z")).toDF("doc_id", "text")
    val batch = Seq((101L, base + " x y w")).toDF("doc_id", "text")
    val inc = Dedup.incrementalDedup(corpus, batch, "doc_id", "text", 3, 16, 8, 0.1)
      .filter(col("kind") === "near").collect()
    assert(inc.length == 1)
    val sym = Dedup.minHashLsh(corpus.union(batch), "doc_id", "text", 3, 16, 8)
      .filter(col("doc_a") === 1L && col("doc_b") === 101L).collect()
    assert(sym.length == 1)
    assert(math.abs(inc(0).getDouble(2) - sym(0).getDouble(2)) < 1e-12)
  }

  test("corpus-side hot-bucket cap bounds a boilerplate-heavy corpus") {
    val viral = (1 to 20).map(i => s"viral$i").mkString(" ")
    val corpus = ((1L to 500L).map(i => (i, viral)) :+ (900L, base)).toDF("doc_id", "text")
    val batch = Seq((1001L, viral), (1002L, base + " tail")).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(corpus, batch, "doc_id", "text",
        3, 16, 8, 0.5, maxBucketSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    // the viral batch doc still EXACT-matches all 500 copies (hash tier
    // is not capped — exact dup of boilerplate is real and cheap), but
    // the NEAR tier never exploded the capped buckets:
    assert(out.count(r => r._1 == 1001L && r._3 == "exact") == 500)
    assert(!out.exists(r => r._1 == 1001L && r._3 == "near"))
    // and the genuine near-dup pair survives the cap
    assert(out.exists(r => r._1 == 1002L && r._2 == 900L && r._3 == "near"))
  }
}
