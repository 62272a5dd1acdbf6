package graft

import org.apache.spark.sql.functions._
import graft.ops.Chunker

/** Chunker edge semantics from `Qdrant/main.py:21-56` (SURVEY §2.2). */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, minLen: Int = 5) =
    Chunker
      .chunk(Seq((1L, text)).toDF("doc_id", "text"), Seq("doc_id"), minLen = minLen)
      .select("chunk_index", "chunk_text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq

  test("P4: min-length filter runs AFTER index assignment — gaps remain") {
    // para 0 long, para 1 short (dropped), para 2 long → indexes 0 and 2
    val got = chunksOf("abcdefgh\n\nxy\n\nijklmnop")
    assert(got == Seq((0L, "abcdefgh"), (2L, "ijklmnop")))
  }

  test("P2: empty-after-trim paragraphs dropped BEFORE index assignment") {
    // middle para is whitespace-only → removed pre-enumerate, NO gap
    val got = chunksOf("abcdefgh\n\n   \n\nijklmnop")
    assert(got == Seq((0L, "abcdefgh"), (1L, "ijklmnop")))
  }

  test("P1: paragraphs are trimmed") {
    val got = chunksOf("  abcdefgh  ")
    assert(got == Seq((0L, "abcdefgh")))
  }

  test("P6: joinParagraphs=false keeps whole doc as one chunk") {
    val df = Seq((1L, "abc\n\ndef")).toDF("doc_id", "text")
    val got = Chunker.chunk(df, Seq("doc_id"), minLen = 1, joinParagraphs = false)
      .select("chunk_index", "chunk_text").collect()
    assert(got.length == 1 && got(0).getString(1) == "abc\n\ndef")
  }

  test("S3: dump line format matches the reference sink") {
    val df = Seq((3, 1, "txt")).toDF("page", "chunk_index", "text")
    val line = df.select(Chunker.dumpLine(col("page"), col("chunk_index"), col("text")))
      .first().getString(0)
    assert(line == "[Page 3 | Chunk 1]\ntxt\n")
  }

  test("slidingChunks: overlap, short-doc single window, tail window, empty doc") {
    // 10 tokens t0..t9, window 4, stride 3 → starts 0,3,6 (start 6
    // already reaches the end — coverage-based count, no tail window)
    val doc = (0 until 10).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a b"), (3L, "   ")).toDF("doc_id", "text")
    val got = Chunker.slidingChunks(df, Seq("doc_id"), "text",
        windowTokens = 4, strideTokens = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._5).toSeq == Seq(
      "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"),
      s"window contents wrong: ${d1.toSeq}")
    assert(d1.map(c => (c._3, c._4)).toSeq == Seq((0L, 4L), (3L, 4L), (6L, 4L)))
    // full coverage: every token appears in at least one window
    assert(d1.flatMap(_._5.split(" ")).toSet == (0 until 10).map(i => s"t$i").toSet)
    // short doc: one window, whole doc
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 2L, "a b")))
    // whitespace-only doc yields nothing
    assert(!got.exists(_._1 == 3L))
    // overlap property: consecutive windows share window-stride tokens
    assert(d1(0)._5.split(" ").drop(3).toSeq == d1(1)._5.split(" ").take(1).toSeq)
  }

  test("slidingChunks: stride > window leaves gaps but no phantom rows") {
    // 10 tokens, window 2, stride 5 → starts 0,5; a naive nw would also
    // try start 10 (empty) — must not appear
    val doc = (0 until 10).map(i => s"t$i").mkString(" ")
    val got = Chunker.slidingChunks(Seq((1L, doc)).toDF("doc_id", "text"),
        Seq("doc_id"), "text", windowTokens = 2, strideTokens = 5)
      .collect().map(r => (r.getLong(2), r.getString(4))).sortBy(_._1)
    assert(got.toSeq == Seq((0L, "t0 t1"), (5L, "t5 t6")), s"got ${got.toSeq}")
  }
}
