package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming analog of the batch event aggregation
  * (Relational.eventsHourly): incremental tumbling-window counts with a
  * watermark. The reference has nothing streaming (SURVEY §1.2) — this is
  * the engine extension that makes the same plan run incrementally: at
  * 100 TB/day the identical `groupBy(window(...))` aggregation runs as a
  * continuous job with state eviction driven by the watermark.
  */
object EventStream {

  /** Schema of the harness events table, with ts as TIMESTAMP (the
    * streaming reader gets parquet-ns-free data in tests).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** The incremental plan: watermark + tumbling 1h window + counts. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n_events"), col("sum_value"))

  /** Drive the streaming plan over a parquet directory with a memory
    * sink, synchronously (for tests / local smoke): returns the final
    * materialized result table.
    */
  def runOnce(spark: SparkSession, inputDir: String, queryName: String): DataFrame = {
    val stream = spark.readStream
      .schema(eventSchema)
      .parquet(inputDir)
    val q = hourlyAgg(stream).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
