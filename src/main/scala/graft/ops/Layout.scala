package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering for multi-column
  * data skipping. Writing a table range-partitioned + sorted by the
  * interleaved key gives every file a TIGHT min/max envelope on BOTH
  * dimensions at once, so scan-time pruning (parquet row-group stats /
  * partition pruning) works for predicates on either column — the
  * standard lakehouse layout move for 100 TB fact tables queried along
  * two+ axes.
  */
object Layout {

  /** Morton code of two non-negative integral columns, `bits` bits
    * each (result uses 2·bits bits): bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. Out-of-range values (negative, or ≥ 2^bits)
    * raise at execution rather than silently aliasing into a wrong
    * bucket. Pure bit arithmetic — codegen'd, no UDF.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits ($bits) must be in [1, 31]")
    val max = 1L << bits
    def guarded(c: Column, name: String): Column =
      when(c.isNull || c < 0 || c >= max,
        // coalesce: concat with a NULL key would NULL the whole
        // message and raise an unreadable "null" — name the culprit
        raise_error(concat(lit(s"zValue: $name out of [0, $max): "),
          coalesce(c.cast("string"), lit("NULL")))))
        .otherwise(c.cast("long"))
    val ga = guarded(a, "first column")
    val gb = guarded(b, "second column")
    (0 until bits).map { i =>
      shiftleft(shiftright(ga, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(gb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Re-layout `df` Z-ordered on (colA, colB): range-partition on the
    * Morton key, sort within partitions, key retained as `zCol` for
    * inspection (drop it before writing if undesired). This is a full
    * shuffle BY DESIGN — a one-time write-side cost paid to make every
    * subsequent scan prunable on both columns.
    */
  def zOrdered(df: DataFrame, colA: String, colB: String, bits: Int,
      numPartitions: Int, zCol: String = "__z"): DataFrame =
    df.withColumn(zCol, zValue(col(colA), col(colB), bits))
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(col(zCol))

  /** Locality audit: bucket rows by the top bits of the Morton key and
    * report each bucket's row count and min/max envelope on both
    * dimensions — small envelopes = effective skipping. `bucketShift`
    * drops that many low bits (so #buckets ≤ 2^(2·bits − bucketShift)).
    */
  def zBucketStats(df: DataFrame, colA: String, colB: String, bits: Int,
      bucketShift: Int): DataFrame = {
    require(bucketShift >= 0 && bucketShift < 2 * bits,
      s"bucketShift ($bucketShift) must be in [0, ${2 * bits})")
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .groupBy(shiftright(col("__z"), bucketShift).as("z_bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col(colA)).as("min_a"), max(col(colA)).as("max_a"),
        min(col(colB)).as("min_b"), max(col(colB)).as("max_b"))
  }
}
