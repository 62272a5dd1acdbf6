package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

object DevProfile2 {
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
    val docs = Tables.documents(spark, sfDir)
    val sh = Dedup.shingleRows(docs, "doc_id", "text", 1).withColumn("h", Dedup.h32(col("sh")))
    time("shingleRows")(println("  n=" + sh.count()))
    val sig = Dedup.minHashSignatures(sh, 16)
    time("signatures")(println("  n=" + sig.count()))
    val bands = Dedup.lshBands(sig, 16, 8)
    time("bands")(println("  n=" + bands.count()))
    val cands = Dedup.lshCandidates(bands)
    time("candidates")(println("  n=" + cands.count()))
    val ver = Dedup.verifyJaccard(cands, sh)
    time("verify")(println("  n=" + ver.count()))
    val filt = ver.filter(col("jaccard") >= 0.5)
    time("full(count)")(println("  n=" + filt.count()))
    spark.stop()
  }
}
