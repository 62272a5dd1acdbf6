package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor building blocks over an embedding column
  * (north-star extension; the exact brute-force kNN in [[Knn]] is the
  * correctness oracle any ANN variant is judged against).
  *
  * IVF-style coarse quantization: bucket vectors by the sign bits of
  * their leading components (a data-independent coarse quantizer — at
  * 100 TB you'd train centroids, but the PLAN SHAPE is identical:
  * bucket-assign both sides, equi-join on bucket, score only
  * within-bucket pairs). Turns the O(Q·N) cross join into
  * O(Q·N/2^bits) with one shuffle on the bucket key.
  */
object SimilaritySearch {

  /** Sign-bit coarse bucket over the first `bits` vector components. */
  def signBucket(vecCol: String, bits: Int): org.apache.spark.sql.Column =
    (0 until bits)
      .map(i => when(element_at(col(vecCol), i + 1) > 0.0f, lit(1L << (bits - 1 - i))).otherwise(lit(0L)))
      .reduce(_ + _)

  /** IVF top-k: queries search only their own bucket. Output:
    * (query_id, rank, point_id, score) — rank within bucket.
    */
  def ivfTopK(
      queries: DataFrame,
      points: DataFrame,
      queryIdCol: String,
      pointIdCol: String,
      vecCol: String,
      bits: Int,
      k: Int): DataFrame = {
    val q = broadcast(
      queries
        .withColumn("__bucket", signBucket(vecCol, bits))
        .select(col(queryIdCol).as("query_id"), col(vecCol).as("__qvec"), col("__bucket")))
    val p = points.withColumn("__bucket", signBucket(vecCol, bits))
    val scored = p
      .join(q, "__bucket") // bucket equi-join — the ANN pruning step
      .withColumn("score", VectorOps.cosine(col("__qvec"), col(vecCol)))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("score"), col(pointIdCol).asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(pointIdCol).as("point_id"), col("score"))
  }

  /** Embedding near-duplicate pairs: all pairs above a cosine threshold,
    * pruned by the same sign-bucket (candidates must share the bucket —
    * documented recall trade-off; brute-force variant sets bits=0).
    */
  def cosineNearDup(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bits: Int): DataFrame = {
    val v = vectors.withColumn("__bucket",
      if (bits > 0) signBucket(vecCol, bits) else lit(0L))
    val a = v.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("__bucket"))
    val b = v.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("__bucket"))
    a.join(b, "__bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", VectorOps.cosine(col("va"), col("vb")))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }
}
