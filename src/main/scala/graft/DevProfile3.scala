package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops._

object DevProfile3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val ev = Tables.events(spark, sfDir)
    time("events.count")(println("  n=" + ev.count()))
    time("distinct users")(println("  n=" + ev.select("user_id").distinct().count()))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val w1 = ev.withColumn("lag_ts", lag(col("ts"), 1).over(byUser))
    time("window lag only")(println("  n=" + w1.count()))
    time("sessionize")(println("  n=" + Relational.sessionize(spark, sfDir).count()))
    time("sessionize again")(println("  n=" + Relational.sessionize(spark, sfDir).count()))
    spark.stop()
  }
}
