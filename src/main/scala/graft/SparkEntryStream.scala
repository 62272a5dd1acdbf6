package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Tables
import graft.streaming.EventStream

/** Query registry, part 3: the Structured-Streaming operators under the
  * SAME oracle gate as the batch queries. Each query materializes the
  * events table to a scratch parquet dir (ns→µs normalized — the
  * streaming reader takes an explicit TIMESTAMP schema), drives the
  * streaming plan to completion against it with a memory sink, and
  * returns the final table. The oracle is the BATCH semantics the
  * stream must converge to on a finite input — the defining property of
  * an incremental operator.
  */
object SparkEntryStream {

  // memory-sink names must be session-unique; Bench reruns each query
  private val runId = new AtomicLong(0)

  /** Stage the 5 streaming-schema columns of `events` as µs-timestamp
    * parquet, run `f` over that dir, then delete the scratch dir (the
    * memory sink has materialized the result by then).
    */
  private def withStagedEvents(spark: SparkSession, sfDir: String)(
      f: String => DataFrame): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    try {
      Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .write.mode("overwrite").parquet(tmp)
      f(tmp)
    } finally {
      deleteRecursively(new java.io.File(tmp))
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // incremental tumbling-window agg ≡ the batch q_events_hourly
    "stream_hourly" -> ((s, d) => withStagedEvents(s, d) { dir =>
      EventStream.runOnce(s, dir, s"graft_stream_hourly_${runId.incrementAndGet()}")
        .orderBy(col("hour"), col("event_type"))
    }),
    // stateful mapGroupsWithState sessionization ≡ the batch gap rule
    "stream_sessionize" -> ((s, d) => withStagedEvents(s, d) { dir =>
      EventStream.runSessionsOnce(s, dir, s"graft_stream_sess_${runId.incrementAndGet()}")
        .select(col("user_id"), col("n_sessions"), col("n_events"))
        .orderBy(col("user_id"))
    }),
    // dropDuplicatesWithinWatermark ingest-dedup: on an already-unique
    // keyed input the stream must be a no-op pass-through (count-shaped
    // summary so the oracle stays tiny and deterministic)
    "stream_dedup" -> ((s, d) => withStagedEvents(s, d) { dir =>
      EventStream.runDedupOnce(s, dir, s"graft_stream_dedup_${runId.incrementAndGet()}")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_id")).as("n_distinct_ids"))
        .orderBy(col("event_type"))
    }))

  def oracleSql: Map[String, String] = Map(
    // identical to the batch hourly oracle — stream must converge to it
    "stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // per-user collapse of the batch sessionize formula (session ids are
    // a 0-based running sum, so n_sessions = sum(gap flags) + 1)
    "stream_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id,
        |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events)
        |SELECT user_id, CAST(sum(new_s) + 1 AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM flagged
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "stream_dedup" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT event_id) AS n_distinct_ids
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)
}
