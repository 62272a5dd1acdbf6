package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the harness parquet tables (TESTDATA.md).
  *
  * All engine inputs are columnar Parquet; scans get predicate pushdown +
  * column pruning from Catalyst for free. At 100 TB the same loaders work
  * against a partitioned object-store layout — nothing here assumes local
  * files beyond the path string.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** The committed planted-cluster embedding fixture
    * (graft.ClusteredFixture; columns vec_id, cluster, embedding) —
    * the corpus where ANN recall measures index quality rather than
    * noise ranking. Lives under the fixtures dir, not sfDir: it is an
    * evaluation corpus with known structure, not harness data.
    */
  def clusteredEmbeddings(spark: SparkSession, fixturesDir: String): DataFrame =
    spark.read.parquet(s"$fixturesDir/clustered_emb.parquet")

  /** `events.ts` arrives in whatever physical flavor the generator chose;
    * normalize every flavor to a session-UTC TIMESTAMP so downstream
    * `unix_micros`/window logic sees one type:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; sessions
    *    set `spark.sql.legacy.parquet.nanosAsLong` and this loader
    *    truncates ns→µs (integer division — same floor the µs-native
    *    oracle applies);
    *  - naive TIMESTAMP(MICROS) (isAdjustedToUTC=false): Spark infers
    *    TIMESTAMP_NTZ; with the session timezone pinned to UTC the cast
    *    to TIMESTAMP is bit-lossless and matches the oracle's naive
    *    epoch interpretation.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
}
