package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact top-k vector search — the reference's retrieval core.
  *
  *  - V4 single-query top-k: `Qdrant/VectorDB/Database.py:22-28`
  *    (`db.search(query_vector, limit=k)`), planned by Spark as
  *    `TakeOrderedAndProject` (partial per-partition top-k, no full sort).
  *  - V5 batch top-k: the reference's sequential per-row loop
  *    (`Qdrant/llm.py:93` calling `:20`) is semantically a k-NN JOIN —
  *    here one declarative plan: broadcast the (small) query side, score,
  *    and take `row_number() <= k` per query. Spark ≥3.5 rewrites the
  *    rank-limit window to `WindowGroupLimit`, i.e. a map-side partial
  *    top-k before the shuffle — per-query state is k rows, never the
  *    full candidate set.
  *
  * Determinism (V6): Qdrant's tie order is undefined; we strengthen to a
  * total order `(score DESC, point_id ASC)` so results are
  * oracle-hashable (SURVEY §2.3 V6).
  *
  * Scale: broadcast-nested-loop on the query side is the exact path; at
  * 100 TB with a large query side, pre-bucket both sides with LSH
  * (see Dedup.minHash*) or an IVF coarse quantizer (SimilaritySearch.ivf*)
  * so only same-bucket pairs are scored — never materialize the unbucketed
  * cross join.
  */
object Knn {

  /** V4: score every point against one literal query vector, keep top-k. */
  def topK(points: DataFrame, vecCol: String, idCol: String, queryVec: Column, k: Int): DataFrame =
    points
      .withColumn("score", VectorOps.cosine(col(vecCol), queryVec))
      .orderBy(desc("score"), col(idCol).asc)
      .limit(k)

  /** V5: k-NN join. `queries` must be the small side (it is broadcast).
    * Output: all query columns + point id + `rank` (1..k) + `score`.
    */
  def knnJoin(
      queries: DataFrame,
      points: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      pointIdCol: String,
      pointVecCol: String,
      k: Int,
      metric: String = "cosine"): DataFrame = {
    val q = broadcast(
      queries.select(
        col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__qvec")))
    val scoreExpr = metric match {
      case "cosine" => VectorOps.cosine(col("__qvec"), col(pointVecCol))
      // dot ≡ cosine when both sides are L2-normalized — 1 array pass vs 3
      case "dot" => VectorOps.dot(col("__qvec"), col(pointVecCol))
      case other => throw new IllegalArgumentException(s"unknown metric: $other")
    }
    val scored = points
      .crossJoin(q)
      .withColumn("score", scoreExpr)
    val w = Window.partitionBy(col("query_id")).orderBy(desc("score"), col(pointIdCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("__qvec")
  }

  /** Filtered k-NN: Qdrant's filtered search (`search(..., query_filter=…)`)
    * — a payload predicate restricts WHICH points are eligible, and the
    * top-k is exact over the survivors. This is PRE-filtering: the
    * predicate applies before scoring, so the result always has k hits
    * when k eligible points exist (post-filtering a plain top-k can
    * return fewer — the classic filtered-ANN deficit). In Spark the
    * composition is free: the predicate lands on the point-side SCAN
    * (PushedFilters, pinned in PlanSpec), so at 100 TB a selective
    * payload filter prunes row groups before a single score is
    * computed — the declarative win over index-side filtered search.
    */
  def filteredKnnJoin(
      queries: DataFrame,
      points: DataFrame,
      payloadFilter: Column,
      queryIdCol: String,
      queryVecCol: String,
      pointIdCol: String,
      pointVecCol: String,
      k: Int,
      metric: String = "cosine"): DataFrame =
    knnJoin(queries, points.filter(payloadFilter),
      queryIdCol, queryVecCol, pointIdCol, pointVecCol, k, metric)

  /** Hard-negative mining for contrastive training: per anchor, the
    * `k` HIGHEST-scoring points whose label differs from the anchor's
    * — the close-but-wrong examples an embedding model learns the most
    * from (random negatives are trivially separable; the hardest ones
    * define the decision boundary). Same broadcast + WindowGroupLimit
    * shape as [[knnJoin]], with the label inequality as a join-side
    * filter: per-anchor state stays k rows, and at 100 TB the corpus
    * side still never moves. Label here is any supervision proxy —
    * class, source, or a dedup cluster id (mining negatives OUTSIDE
    * the anchor's near-dup cluster avoids training on false
    * negatives that are really unlabeled positives).
    */
  def hardNegatives(
      anchors: DataFrame,
      points: DataFrame,
      anchorIdCol: String,
      anchorVecCol: String,
      anchorLabelCol: String,
      pointIdCol: String,
      pointVecCol: String,
      pointLabelCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val a = broadcast(anchors.select(
      col(anchorIdCol).as("query_id"),
      col(anchorVecCol).as("__qvec"),
      col(anchorLabelCol).as("__qlabel")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("score"), col(pointIdCol).asc)
    points
      .crossJoin(a)
      .filter(col(pointLabelCol) =!= col("__qlabel"))
      .withColumn("score", VectorOps.cosine(col("__qvec"), col(pointVecCol)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(pointIdCol).as("point_id"),
        col("score"), col(pointLabelCol).as("neg_label"))
  }

  /** Radius search: every point scoring at least `threshold` for each
    * query — the vector-store API next to top-k (Qdrant exposes it as
    * `score_threshold`; "all sufficiently similar", not "the k most
    * similar"). Same broadcast discipline as [[knnJoin]], but CHEAPER
    * at scale: a pure threshold needs no per-query ranking state at
    * all, so the whole operator is one scan-side filter — no window,
    * no WindowGroupLimit, no exchange; output order is imposed only by
    * the caller.
    */
  def rangeSearch(
      queries: DataFrame,
      points: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      pointIdCol: String,
      pointVecCol: String,
      threshold: Double): DataFrame = {
    val q = broadcast(
      queries.select(
        col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__qvec")))
    points
      .crossJoin(q)
      .withColumn("score", VectorOps.cosine(col("__qvec"), col(pointVecCol)))
      .filter(col("score") >= threshold)
      .select(col("query_id"), col(pointIdCol).as("point_id"), col("score"))
  }
}
