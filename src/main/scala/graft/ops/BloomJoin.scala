package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomAgg

/** Bloom-accelerated EXACT semi/anti joins — the explicit form of the
  * runtime-filter optimization (Spark's `InjectRuntimeFilter` applies
  * it opportunistically; this operator makes it deterministic and
  * caller-sized).
  *
  * Why it matters at 100 TB: a plain semi-join shuffles BOTH sides on
  * the key — including the 100 TB probe side. Here the build side
  * collapses to ONE filter value (numBits/8 bytes) embedded in the
  * probe predicate; rows failing the membership probe die AT THE SCAN,
  * before any exchange. Only the surviving sliver (true matches + the bloom's
  * false-positive rate) reaches the exact confirmation join, so the
  * shuffle is proportional to the MATCH size, not the input size.
  *
  * Exactness: a Bloom filter has no false negatives, so the prefilter
  * never drops a real match, and the confirming join removes the false
  * positives — the result is row-identical to the plain join at any
  * false-positive rate (the rate only moves the perf, not the answer).
  */
object BloomJoin {

  /** Size the filter: ~10 bits/key ≈ 1% fp at 7 hash functions,
    * rounded up to a multiple of 64, floor 1024 bits.
    */
  def bitsFor(expectedKeys: Long, bitsPerKey: Int = 10): Int = {
    val raw = math.max(1024L, expectedKeys * bitsPerKey)
    val capped = math.min(raw, Int.MaxValue.toLong - 63L)
    (((capped + 63L) / 64L) * 64L).toInt
  }

  /** Rows of `big` whose `bigKey` appears in `small.smallKey`
    * (exact semi-join), bloom-prefiltered. Output columns = `big`'s.
    */
  def bloomSemiJoin(big: DataFrame, bigKey: String, small: DataFrame, smallKey: String,
      numBits: Int = 1 << 20, numHashFns: Int = 7): DataFrame = {
    val pre = bloomPrefilter(big, bigKey, small, smallKey, numBits, numHashFns)
    // rename the build key so the confirm join is unambiguous even when
    // both sides use the same column name
    pre.join(small.select(col(smallKey).as("__bloom_k")).distinct(),
      pre(bigKey) === col("__bloom_k"), "left_semi")
  }

  /** The prefilter stage alone (candidates = true matches + false
    * positives) — exposed so tests can measure the fp rate and plans
    * can be audited; production callers want [[bloomSemiJoin]].
    *
    * The filter is built EAGERLY (one small job over the build side —
    * map-side-combinable aggregate, one-row result) and embedded in the
    * probe predicate as a BINARY literal, the same two-phase shape
    * Spark's own `InjectRuntimeFilter` produces (bloom built by a
    * scalar subquery, probe expression holding the bytes as a
    * constant). A literal is loaded into the generated class ONCE per
    * task. The first cut instead carried the filter as a one-row
    * broadcast through a cross join and read the BINARY column inside
    * the per-row probe — and `UnsafeRow.getBinary` COPIES the array,
    * so every probed row paid a numBits/8-byte memcpy: at sf0.1
    * (1 M bits, 600 k lineitem rows in one input split) that was 75 GB
    * of copying in a single 12-minute task. The probe side must never
    * pay per-row costs proportional to the FILTER size.
    */
  def bloomPrefilter(big: DataFrame, bigKey: String, small: DataFrame, smallKey: String,
      numBits: Int, numHashFns: Int): DataFrame = {
    // xxhash64 is type-sensitive: BIGINT 5 and VARCHAR '5' hash apart,
    // so mismatched key types would silently drop every match
    require(big.schema(bigKey).dataType == small.schema(smallKey).dataType,
      s"bloom join key types must match: $bigKey is " +
        s"${big.schema(bigKey).dataType.catalogString}, $smallKey is " +
        s"${small.schema(smallKey).dataType.catalogString}")
    val bytes = small
      .agg(BloomAgg.bloomAgg(xxhash64(col(smallKey)), numBits, numHashFns).as("__bloom"))
      .head().getAs[Array[Byte]](0)
    big.filter(BloomAgg.mightContain(lit(bytes), xxhash64(col(bigKey))))
  }
}
