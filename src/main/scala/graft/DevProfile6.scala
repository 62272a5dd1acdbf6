package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Dev tool: reproduce the "dedup_cluster slows the next query" effect
  * and attribute it (GC? shuffle-file cleanup? block manager?).
  */
object DevProfile6 {
  def gcMillis: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val g0 = gcMillis
      val r = f
      println(f"[profile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  gc=${gcMillis - g0}%d ms")
      r
    }
    // Warm up like Bench does
    Seq("q1_pricing", "v_knn_join", "q_events_hourly").foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).count()
    }
    time("v_embed_text BEFORE")(SparkEntry.queries("v_embed_text")(spark, sfDir).count())
    time("dedup_cluster")(SparkEntry.queries("dedup_cluster")(spark, sfDir).count())
    time("clearCache")(spark.catalog.clearCache())
    time("v_embed_text AFTER")(SparkEntry.queries("v_embed_text")(spark, sfDir).count())
    time("v_embed_text AFTER2")(SparkEntry.queries("v_embed_text")(spark, sfDir).count())
    time("rag_flagship AFTER")(SparkEntry.queries("rag_flagship")(spark, sfDir).count())
    spark.stop()
  }
}
