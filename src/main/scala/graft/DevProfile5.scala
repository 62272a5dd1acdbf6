package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** Dev tool: stage-by-stage timing of the dedup_cluster pipeline. */
object DevProfile5 {
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
    val sh = Dedup.shingleRows(docs, "doc_id", "text", 3).withColumn("h", Dedup.h32(col("sh")))
    time("shingleRows.count")(println("  n=" + sh.count()))
    val sig = Dedup.minHashSignatures(sh, 16)
    time("signatures.count")(println("  n=" + sig.count()))
    val bands = Dedup.lshBands(sig, 16, 8)
    time("bands.count")(println("  n=" + bands.count()))
    val cands = Dedup.lshCandidates(bands)
    time("candidates.count")(println("  n=" + cands.count()))
    val pairsAll = Dedup.verifyJaccard(cands, sh)
    time("verifyJaccard.count")(println("  n=" + pairsAll.count()))
    val pairs = pairsAll.filter(col("jaccard") >= 0.5)
    time("pairs>=0.5.count")(println("  n=" + pairs.count()))
    // inline clusterLabels with per-round timing
    def mkEdges() = pairs
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    time("edges no-persist count")(println("  n=" + mkEdges().count()))
    spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    val edges = mkEdges().persist()
    time("edges materialize (AQE-cache)")(println("  n=" + edges.count()))
    var labels = docs.select(col("doc_id"), col("doc_id").as("label"))
    for (i <- 1 to 3) {
      val nbr = edges
        .join(labels.select(col("doc_id").as("dst"), col("label")), "dst")
        .select(col("src").as("doc_id"), col("label"))
      labels = labels.union(nbr).groupBy(col("doc_id")).agg(min(col("label")).as("label"))
        .persist()
      time(s"round $i")(println("  n=" + labels.count()))
    }
    spark.stop()
  }
}
