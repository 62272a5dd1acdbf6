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
}
