package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** Dev tool: stage-by-stage timing of the flagship pipeline. */
object DevProfile {
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
    val chunks = Chunker.chunk(docs, Seq("doc_id"), separator = " the ", minLen = 20)
      .withColumn("chunk_id", col("doc_id") * 1000 + col("chunk_index"))
    time("chunks.count")(println("  n=" + chunks.count()))
    val chunkEmb = VectorOps.embedTextDistributed(chunks, Seq("chunk_id"), "chunk_text", 64)
    time("chunkEmb.count")(println("  n=" + chunkEmb.count()))
    val points = chunks.join(chunkEmb, "chunk_id")
    time("points.count")(println("  n=" + points.count()))
    val queries = VectorOps
      .embedTextDistributed(docs.filter(col("doc_id") < 5), Seq("doc_id"), "text", 64)
      .select(col("doc_id").as("qid"), col("embedding").as("qvec"))
    time("queries.count")(println("  n=" + queries.count()))
    val hits = Knn.knnJoin(queries, points, "qid", "qvec", "chunk_id", "embedding", 5, metric = "dot")
    time("hits.count")(println("  n=" + hits.count()))
    val pc = points.cache(); pc.count()
    val qc = queries.cache(); qc.count()
    val hitsCached = Knn.knnJoin(qc, pc, "qid", "qvec", "chunk_id", "embedding", 5, metric = "dot")
    time("hits(cached inputs)")(println("  n=" + hitsCached.count()))
    val scoredOnly = pc.crossJoin(broadcast(qc))
      .select(VectorOps.dot(col("qvec"), col("embedding")).as("s"))
      .agg(sum(col("s")))
    time("dot-only agg")(println("  " + scoredOnly.first()))
    val full = Rag.flagship(spark, sfDir)
    time("flagship.count")(println("  n=" + full.count()))
    spark.stop()
  }
}
