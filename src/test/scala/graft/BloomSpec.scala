package graft

import org.apache.spark.sql.functions._
import graft.functions.{BloomAgg, BloomProbe}
import graft.ops.BloomJoin

/** Bloom filter aggregate + membership expression + the exact
  * bloom-prefiltered semi-join built on them.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  /** xxhash64 of each key, computed by Spark itself in one pass (keeps
    * Spark's hash implementation authoritative for the raw probes).
    */
  private def sparkHashes(keys: Seq[Long]): Array[Long] =
    keys.toDF("k").select(xxhash64(col("k"))).as[Long].collect()

  test("no false negatives — every inserted key probes true, across merges") {
    // repartition(8) forces the partial-buffer merge path
    val keys = (1L to 2000L).map(_ * 7919L)
    val df = keys.toDF("k").repartition(8)
    val bloom = df.agg(BloomAgg.bloomAgg(xxhash64(col("k")), numBits = 4096))
      .collect()(0).getAs[Array[Byte]](0)
    // 4096 bits / 2000 keys is deliberately overloaded — false positives
    // abound, but false negatives must NOT exist
    val misses = sparkHashes(keys).count(h => !BloomProbe.mightContain(bloom, h))
    assert(misses == 0, s"$misses inserted keys probed false")
  }

  test("false-positive rate at ~10 bits/key stays in the expected band") {
    val n = 1000
    val df = (1L to n.toLong).toDF("k")
    val bloom = df.agg(BloomAgg.bloomAgg(xxhash64(col("k")), BloomJoin.bitsFor(n)))
      .collect()(0).getAs[Array[Byte]](0)
    val probes = (100001L to 110000L).toSeq
    val fp = sparkHashes(probes).count(h => BloomProbe.mightContain(bloom, h))
      .toDouble / probes.size
    assert(fp < 0.05, s"fp rate $fp out of band for 10 bits/key") // theory ~1%
  }

  test("bloomSemiJoin is row-identical to the plain semi-join") {
    val big = (1L to 5000L).map(i => (i, i % 997L)).toDF("row_id", "key")
    val small = (1L to 200L).map(i => Tuple1(i * 5L)).toDF("k")
    val got = BloomJoin.bloomSemiJoin(big, "key", small, "k", numBits = 1024)
      .select("row_id").as[Long].collect().sorted
    val want = big.join(small, big("key") === small("k"), "left_semi")
      .select("row_id").as[Long].collect().sorted
    assert(got.sameElements(want))
    assert(want.nonEmpty)
  }

  test("prefilter passes false positives; confirm join removes them") {
    // tiny filter → heavy fp rate; the STAGE is approximate but the
    // composed join stays exact (previous test) — here we pin that the
    // prefilter is a SUPERSET of the matches (bloom does the pruning,
    // the confirm join the exactness)
    val big = (1L to 2000L).toDF("key").withColumn("row_id", col("key"))
    val small = (1L to 2000L).filter(_ % 100 == 0).map(Tuple1(_)).toDF("k")
    val pre = BloomJoin.bloomPrefilter(big, "key", small, "k", numBits = 256, numHashFns = 3)
      .select("row_id").as[Long].collect().toSet
    val exact = big.join(small, big("key") === small("k"), "left_semi")
      .select("row_id").as[Long].collect().toSet
    assert(exact.subsetOf(pre), "prefilter must never drop a true match")
    assert(pre.size < 2000, "a 256-bit filter still prunes something")
  }

  test("key-type mismatch is rejected loudly") {
    val big = Seq((1L, "x")).toDF("key", "v")
    val small = Seq(Tuple1("1")).toDF("k")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.bloomPrefilter(big, "key", small, "k", 1024, 7)
    }
    assert(e.getMessage.contains("key types must match"))
  }

  test("aggregate rejects non-BIGINT input at analysis time") {
    val df = Seq(Tuple1("s")).toDF("k")
    val e = intercept[Exception] {
      df.agg(BloomAgg.bloomAgg(col("k"), 1024)).collect()
    }
    assert(e.getMessage.contains("BIGINT"))
  }
}
