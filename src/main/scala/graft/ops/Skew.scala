package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns (SURVEY §2.9 scale discipline / build-brief
  * "salting for skew"). AQE's skew-join split handles most cases at
  * runtime; explicit salting is the plan-level tool when one reduce key
  * dominates (the classic: one user/customer with 10⁸ events).
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key, salt) partial → groupBy
    * (key) final. The hot key's rows spread over `saltBuckets` reducers
    * in phase 1; phase 2 combines `saltBuckets` partial rows per key —
    * bounded fan-in regardless of skew. Result is EXACTLY the plain
    * groupBy result (sums/counts are associative), which is what the
    * DuckDB oracle checks.
    *
    * `aggs` maps output column name → (partial aggregate of the input
    * column, final combiner of the partial column).
    */
  def saltedSumCount(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      saltSourceCol: String,
      saltBuckets: Int): DataFrame = {
    // salt from a ROW-UNIQUE column, never from the aggregated value: a
    // hot key whose rows share one value (constant error pings) would
    // hash every row into the same salt bucket and recreate the
    // straggler the salt exists to break up
    val salted = df.withColumn("__salt", pmod(hash(col(saltSourceCol)), lit(saltBuckets)))
    salted
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("__psum")).as("__sum"), sum(col("__pcnt")).as("n"))
      .select(col(keyCol), round(col("__sum"), 2).as("sum_value"), col("n"))
  }

  /** Salted shuffle join for a skewed BIG side that must meet a small-
    * but-not-broadcastable side: the small side is replicated once per
    * salt bucket (|small| × saltBuckets rows — the price of the cure),
    * the big side salts each row from a row-unique column, and the join
    * runs on (key, salt) — the hot key's rows land on `saltBuckets`
    * reducers instead of one straggler. Row-identical to the plain
    * equi-join for ANY saltBuckets (inner join; every big row meets
    * exactly the replica carrying its salt).
    *
    * When the small side FITS in memory, broadcast and skip all of this
    * — salting only pays when both sides must shuffle (AQE's skew split
    * covers sort-merge joins at runtime; explicit salting is the
    * plan-level form, and the one that also works for the partial-agg
    * shapes AQE cannot split). Output: big columns then small columns,
    * salt dropped.
    *
    * `joinType` supports `inner` and `left`/`left_outer` — the common
    * skewed-enrichment shape (events ⟕ optional dimension). Left-outer
    * stays row-identical to the plain outer equi-join for free: a big
    * row can only meet the replicas carrying its own salt, so an
    * unmatched key null-fills exactly once. Right/full outer are
    * REJECTED: an unmatched SMALL-side row exists once per salt
    * replica and would be emitted `saltBuckets` times.
    */
  def saltedJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      saltSourceCol: String,
      saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets ($saltBuckets) must be >= 1")
    require(Set("inner", "left", "leftouter")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner and left outer only (got '$joinType') — " +
        "right/full outer would emit each unmatched small-side row once per salt replica")
    val rep = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    val salted = big.withColumn("__salt",
      pmod(hash(col(saltSourceCol)), lit(saltBuckets)))
    salted
      .join(rep, salted(bigKey) === rep(smallKey)
        && salted("__salt") === rep("__salt"), joinType)
      .drop("__salt")
  }
}
