package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** IVF search against a PRE-BUCKETED point table — the index layout
    * as a storage property. [[ivfTopK]] broadcasts the query side,
    * which is right for interactive lookups; a BATCH search (millions
    * of queries against the same index) cannot broadcast, and the
    * fallback equi-join shuffles BOTH sides on the bucket key —
    * including the 100 TB point side, once per search batch. Writing
    * the points ONCE with `bucketBy(n, bucketCol)` over the
    * materialized sign bucket gives every later search scan the join's
    * required distribution: only the query side moves, for any number
    * of batch searches (plan-pinned in BucketingSpec — exactly one
    * bucket-key exchange, on the query side). Same semantics as
    * [[ivfTopK]]; `bucketedPoints` must carry the materialized
    * `bucketCol` (= `signBucket(vecCol, bits)` at write time).
    *
    * `nprobe` > 1 is standard multi-probe LSH (Lv et al. 2007, VLDB):
    * single-probe recall is capped by how often a neighbor's sign
    * pattern matches the query's exactly, and the buckets most likely
    * to hide missed neighbors are reached by flipping the query's
    * LEAST-CONFIDENT sign bits (smallest |component|). The QUERY side
    * explodes into its own bucket plus the `nprobe - 1`
    * lowest-|component| single-bit flips — the stored point side still
    * never moves, so the recall knob costs only nprobe× query-side
    * rows, on exactly the side that is small in the serving shape.
    * Probed buckets are distinct, so no pair is scored twice.
    */
  def ivfTopKStored(
      queries: DataFrame,
      bucketedPoints: DataFrame,
      queryIdCol: String,
      pointIdCol: String,
      vecCol: String,
      bucketCol: String,
      bits: Int,
      k: Int,
      nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1 && nprobe <= bits + 1,
      s"nprobe ($nprobe) must be in [1, bits + 1 = ${bits + 1}] — single-bit probe " +
        "sequences reach exactly the own bucket plus one flip per sign bit")
    val q0 = queries
      .select(col(queryIdCol).as("query_id"), col(vecCol).as("__qvec"))
    val q = explodeProbes(q0, bucketCol, bits, nprobe)
    val scored = bucketedPoints
      .join(q, bucketCol)
      .withColumn("score", VectorOps.cosine(col("__qvec"), col(vecCol)))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("score"), col(pointIdCol).asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(pointIdCol).as("point_id"), col("score"))
  }

  /** Explode a query frame carrying `__qvec` into one row per probed
    * bucket as `bucketCol`: the own sign bucket plus the `nprobe - 1`
    * LEAST-confident single-bit flips (Lv et al. 2007 multi-probe —
    * see [[ivfTopKStored]]'s scaladoc). (|component|, mask) pairs sort
    * by magnitude with ties broken by mask via struct `array_sort`
    * (oracle mirrors: ORDER BY a, m); probed buckets are distinct, so
    * no downstream pair is scored twice. ONE definition shared by
    * [[ivfTopKStored]] and [[ivfBqRerankTopK]]; extra columns on the
    * frame ride along.
    */
  private def explodeProbes(q0: DataFrame, bucketCol: String, bits: Int,
      nprobe: Int): DataFrame =
    if (nprobe == 1) q0.withColumn(bucketCol, signBucket("__qvec", bits))
    else {
      val flips = array((0 until bits).map(i =>
        struct(abs(element_at(col("__qvec"), i + 1)).cast("double").as("a"),
          lit(1L << (bits - 1 - i)).as("m"))): _*)
      val own = signBucket("__qvec", bits)
      val probes = concat(
        array(own),
        transform(slice(array_sort(flips), 1, nprobe - 1),
          s => own.bitwiseXOR(s.getField("m"))))
      q0.withColumn(bucketCol, explode(probes))
    }

  /** Composed IVF + BQ search over ONE stored index — the production
    * recipe modern vector stores ship as "IVF with binary
    * quantization": the sign bucket prunes the corpus to the probed
    * cells (an equi-join the bucketed index serves with zero
    * point-side movement), the packed signature ranks the survivors
    * with 2-ALU-op Hamming (no float vector is read in the pair pass),
    * and exact cosine reranks the `shortlist` finalists fetched BY ID.
    * Three costs, each paid on the smallest possible set: bucket join
    * on the index layout, Hamming on cell populations, FMAs on
    * `shortlist` rows per query. `idxPoints` is the stored table
    * `(pointIdCol, bucketCol, sigCol)` with `bucketCol = signBucket`
    * and `sigCol = packSignBits` materialized at ingest, written
    * `bucketBy(n, bucketCol)` (BucketingSpec pins the single
    * query-side bucket exchange). Multi-probe (`nprobe`) recovers
    * recall exactly as in [[ivfTopKStored]] — shared probe rule.
    * Output: `(query_id, rank, point_id, score)` — exact full-width
    * scores, standard total order.
    */
  def ivfBqRerankTopK(
      queries: DataFrame,
      idxPoints: DataFrame,
      points: DataFrame,
      queryIdCol: String,
      pointIdCol: String,
      vecCol: String,
      bucketCol: String,
      sigCol: String,
      bits: Int,
      dim: Int,
      nprobe: Int,
      shortlist: Int,
      k: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= bits + 1,
      s"nprobe ($nprobe) must be in [1, bits + 1 = ${bits + 1}]")
    require(k >= 1 && shortlist >= k,
      s"need shortlist ($shortlist) >= k ($k) >= 1")
    val q0 = queries.select(col(queryIdCol).as("query_id"),
        col(vecCol).as("__qvec"))
      .withColumn("__qsig", packSignBits(col("__qvec"), dim))
    val q = explodeProbes(q0, bucketCol, bits, nprobe)
      .select(col("query_id"), col("__qsig"), col(bucketCol))
    val wPre = Window.partitionBy(col("query_id"))
      .orderBy(col("__ham").asc, col("point_id").asc)
    val shortIds = idxPoints
      .select(col(pointIdCol).as("point_id"), col(bucketCol), col(sigCol).as("__psig"))
      .join(q, bucketCol)
      .withColumn("__ham", hammingUnrolled(col("__qsig"), col("__psig"), dim))
      .withColumn("__hrank", row_number().over(wPre))
      .filter(col("__hrank") <= shortlist)
      .select(col("query_id"), col("point_id"))
    fetchAndRerank(shortIds, queries, points, queryIdCol, pointIdCol, vecCol, k)
  }

  /** Deterministic spherical k-means (Lloyd's algorithm, loop-unrolled
    * `iters` times) for a TRAINED IVF coarse quantizer — the 100 TB
    * upgrade over [[signBucket]]: centroids adapt to the data
    * distribution, so buckets are balanced and probing the `nprobe`
    * nearest cells recovers more of the exact top-k per candidate
    * scored (measured on the harness embeddings, recall@3 vs the
    * sign quantizer: 0.47 → 0.55 at the same 1/4 probe budget, 0.78
    * at nprobe=4 — and nprobe is a knob the sign bucket doesn't have).
    *
    * Determinism (DuckDB-oracle requirement): init = the `k` lowest-id
    * vectors; assignment = max cosine with ties to the lowest centroid
    * id; update = element-wise mean ROUNDED to 6 dp so both engines
    * iterate from identical centroid values regardless of their
    * aggregation order. All DataFrame ops — assignment is a broadcast
    * cross join (k rows) + one window, update is posexplode + two
    * group-bys; nothing here needs a driver-side loop over data.
    */
  def kmeansCentroids(points: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, iters: Int): DataFrame = {
    // centroid ids are cast("long") of the seed ids below; a string id
    // would silently NULL-cast and corrupt every downstream tie-break
    require(points.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"kmeansCentroids: id column '$idCol' must be numeric " +
        s"(got ${points.schema(idCol).dataType.simpleString}) — centroid ids are " +
        "the seed vectors' own ids cast to long; map string ids to a surrogate first")
    val pts = normalized(points, idCol, vecCol)
    // Centroid id = the seed vector's own id (requires a numeric id
    // column). Distinct, deterministic, and ORDER-PRESERVING vs a
    // row_number()-1 labeling (ids ascend either way), so the
    // lowest-cid assignment/probe tie-breaks pick the same cells — and
    // it needs no global window over the seed frame (a `Window` with a
    // foldable partition key gets constant-folded to an unpartitioned
    // WindowExec: single-partition warning + a pointless exchange).
    var cents = pts.orderBy(col("__id")).limit(k)
      .select(col("__id").cast("long").as("cid"), col("__v").as("centroid"))
    for (_ <- 1 to iters) {
      // Update = `dim` per-component avg aggregates in ONE group-by
      // (map-side combinable, one shuffle of k×dim partials per mapper)
      // rather than posexplode + two shuffles: exploding multiplies the
      // assignment output by `dim` before the exchange — a 64× row
      // blowup at 100 TB for no information gain.
      val avgs = (0 until dim).map(j =>
        round(avg(element_at(col("__v"), j + 1)), 6).as(s"__m$j"))
      val updated = assignToCentroid(pts, cents)
        .groupBy(col("cid"))
        .agg(avgs.head, avgs.tail: _*)
        .select(col("cid"),
          array((0 until dim).map(j => col(s"__m$j")): _*).as("__upd"))
      // A cell that attracted no vectors this round vanishes from the
      // group-by; without this join k would silently SHRINK for the rest
      // of the run (and the IVF built on the result would lose cells).
      // Keep the previous centroid instead — the standard "stale cell"
      // rule, and a k-row join on both engines (oracle mirrors it).
      cents = cents
        .join(updated, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("__upd"), col("centroid")).as("centroid"))
        // Flat lineage per round (the Dedup.clusterLabels discipline,
        // same rationale as Pq.trainCodebooks): `cents` is referenced
        // twice per round (assignment + stale-cell join), so the
        // logical plan would double per iteration; the eager checkpoint
        // materializes the k-row model and truncates the plan to a leaf.
        // Non-replicated storage: an executor loss mid-training aborts
        // rather than recomputes — fine for a cheap k-row model; use
        // reliable checkpoint() when a checkpoint dir is configured.
        .localCheckpoint(true)
    }
    cents
  }

  /** (id, vec) projected to internal names, elements widened to double
    * (parity with the oracle's per-element `::DOUBLE`).
    */
  private def normalized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))

  /** Nearest-centroid assignment: broadcast the (tiny) centroid table,
    * score all cells per vector, keep the max-cosine cell.
    */
  private def assignToCentroid(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("__id")).orderBy(desc("__s"), col("cid"))
    vecs.crossJoin(broadcast(cents))
      .withColumn("__s", VectorOps.cosine(col("__v"), col("centroid")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id"), col("__v"), col("cid"))
  }

  /** Trained centroids as a driver-local DataFrame — k rows of dim
    * doubles, bounded by the kCentroids parameter (this is the model,
    * same as Spark ML's KMeansModel holding centers locally). The
    * consumers then read a local relation: training runs exactly once,
    * with no persist() left leaking in the cache manager and no
    * Lloyd-subtree re-execution per consumer (measured at sf0.1: ~5 s
    * vs 6.2 s unpersisted recompute, comparable to the persist variant
    * without its unreleasable cache entry).
    */
  def trainedCentroids(points: DataFrame, pointIdCol: String, vecCol: String,
      dim: Int, kCentroids: Int, iters: Int): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    kmeansCentroids(points, pointIdCol, vecCol, dim, kCentroids, iters)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .toDF("cid", "centroid")
  }

  /** Points labeled with their nearest trained cell:
    * (point_id, __pv double-vector, cid). This is the INDEX layout —
    * write it once with `bucketBy(n, "cid")` and every later batch
    * search scans it with zero point-side movement (the trained
    * sibling of the sign-bucket index in `sim_ivf_batch`).
    */
  def assignPoints(points: DataFrame, pointIdCol: String, vecCol: String,
      cents: DataFrame): DataFrame =
    assignToCentroid(normalized(points, pointIdCol, vecCol), cents)
      .select(col("__id").as("point_id"), col("__v").as("__pv"), col("cid"))

  /** Search an ALREADY-ASSIGNED point table: each query probes its
    * `nprobe` nearest centroids (broadcast, k rows) and scores only
    * those cells' points. Shared tail of the in-plan trained search
    * and the stored-index search — when `assignedPts` is a
    * `bucketBy(cid)` table, the cell join needs only the query-side
    * exchange (plan-pinned in BucketingSpec).
    */
  def searchAssignedCells(
      assignedPts: DataFrame,
      cents: DataFrame,
      queries: DataFrame,
      queryIdCol: String,
      vecCol: String,
      nprobe: Int,
      k: Int): DataFrame = {
    val wq = Window.partitionBy(col("__id")).orderBy(desc("__s"), col("cid"))
    val probes = normalized(queries, queryIdCol, vecCol)
      .crossJoin(broadcast(cents))
      .withColumn("__s", VectorOps.cosine(col("__v"), col("centroid")))
      .withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= nprobe)
      .select(col("__id").as("query_id"), col("__v").as("__qv"), col("cid"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("score"), col("point_id"))
    assignedPts.join(probes, "cid")
      .withColumn("score", VectorOps.cosine(col("__qv"), col("__pv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("point_id"), col("score"))
  }

  /** Trained-IVF top-k with multi-probe: points live in their nearest
    * centroid cell; each query probes its `nprobe` nearest cells and
    * scores only those cells' points. One shuffle on the cell id joins
    * the two sides — the same plan shape at 100 TB, where the centroid
    * table stays broadcast-small (k ≪ N) and cell populations are
    * balanced by training rather than luck.
    */
  def ivfTrainedTopK(
      queries: DataFrame,
      points: DataFrame,
      queryIdCol: String,
      pointIdCol: String,
      vecCol: String,
      dim: Int,
      kCentroids: Int,
      iters: Int,
      nprobe: Int,
      k: Int): DataFrame = {
    val cents = trainedCentroids(points, pointIdCol, vecCol, dim, kCentroids, iters)
    searchAssignedCells(assignPoints(points, pointIdCol, vecCol, cents), cents,
      queries, queryIdCol, vecCol, nprobe, k)
  }

  /** Per-cluster prototypicality pruning — the data-pruning recipe of
    * Sorscher et al. 2022 (NeurIPS, "Beyond neural scaling laws"):
    * cluster the embedding space, score each point by its cosine to its
    * own cluster centroid (the PROTOTYPICALITY of the example), and
    * keep only the `keepFrac` HARDEST (least prototypical) examples of
    * each cluster — with abundant data, easy/prototypical examples are
    * the ones worth dropping. Dropping per CLUSTER rather than globally
    * preserves coverage: no region of the embedding space is emptied
    * just because its examples are all easy.
    *
    * Scale shape: centroid assignment is a broadcast nested-loop over
    * the k-row centroid table (map-side, no shuffle); the per-cluster
    * count + rank windows share ONE exchange on `cid`. At this fixture
    * k = 16, so the window stage has 16 partitions — at 100 TB the
    * quantizer is trained with k ~ sqrt(N) (tens of thousands of
    * cells, the same knob the IVF index turns), which is exactly what
    * re-balances these windows; a keep-hardest THRESHOLD (per-cluster
    * score quantile, broadcast back) is the approximate fallback if
    * even that leaves a mega-cluster.
    *
    * Ties (same score within a cluster) break by point id, so the kept
    * set is a total function of the input. `cluster_n` counts the
    * cluster BEFORE pruning; `greatest(1, floor(n * keepFrac))` keeps
    * at least one example per non-empty cluster.
    * Output: `(cid, point_id, cluster_n, rank, score)` — rank 1 is the
    * hardest example of its cluster.
    */
  /** Cluster data-map cards — the per-cluster report curation
    * decisions read (the embedding-space analog of the corpus data
    * card; the lens SemDeDup-style analyses and cluster-balanced
    * sampling start from): for every trained cell, its population and
    * corpus share, its cohesion (mean/min cosine of members to the
    * centroid — a low mean names a junk-drawer cell whose "semantic
    * dedup" would merge unrelated docs), and its most prototypical
    * member as the human-inspectable representative (max cosine, ties
    * to the lowest point id).
    *
    * Scale shape: broadcast centroid assignment (map-side), then ONE
    * `cid` exchange shared by the count/avg/min/rank windows; the
    * 1-row corpus total rides the plan as a broadcast aggregate.
    * Output is k rows — the whole card is driver-readable at any
    * corpus size. Output: `(cid, cluster_n, corpus_frac,
    * representative, rep_score, mean_score, min_score)`.
    */
  def clusterCards(points: DataFrame, pointIdCol: String, vecCol: String,
      cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("cid"))
    val wr = Window.partitionBy(col("cid")).orderBy(desc("score"), col("point_id"))
    val scored = assignPoints(points, pointIdCol, vecCol, cents)
      .join(broadcast(cents), "cid")
      .withColumn("score", VectorOps.cosine(col("__pv"), col("centroid")))
    val total = broadcast(scored.agg(count(lit(1)).cast("double").as("__n")))
    scored
      .withColumn("cluster_n", count(lit(1)).over(w))
      .withColumn("__mean", avg(col("score")).over(w))
      .withColumn("__min", min(col("score")).over(w))
      .withColumn("__rn", row_number().over(wr))
      .filter(col("__rn") === 1)
      .crossJoin(total)
      .select(col("cid"), col("cluster_n"),
        round(col("cluster_n") / col("__n"), 6).as("corpus_frac"),
        col("point_id").as("representative"),
        round(col("score"), 6).as("rep_score"),
        round(col("__mean"), 6).as("mean_score"),
        round(col("__min"), 6).as("min_score"))
  }

  /** Cluster-balanced sampling — cap every trained cell at `perCell`
    * members (the flattening step cluster-aware curation applies after
    * reading the [[clusterCards]] report): within a cell the kept set
    * is a deterministic pseudo-random draw (ordered by the portable
    * 32-bit md5 hash of the id, ties to the id), NOT by
    * prototypicality — a balanced sample wants an unbiased slice of
    * each cluster, where [[prototypicalityPrune]] deliberately keeps
    * the hardest. Cells smaller than the cap pass through whole.
    *
    * Scale shape: broadcast centroid assignment (map-side), then ONE
    * `cid` exchange shared by the count and rank windows. Skew-safe by
    * construction at the output — no cell emits more than `perCell`
    * rows — while the window over a degenerate giant cell is the same
    * single-partition bill every per-cell operator here pays; the
    * production knob is k ~ √N centroids, which bounds expected cell
    * size. Output: `(cid, point_id, cluster_n, rank)`, rank ≤ perCell.
    */
  def clusterBalancedSample(points: DataFrame, pointIdCol: String, vecCol: String,
      cents: DataFrame, perCell: Int): DataFrame = {
    require(perCell > 0, s"perCell ($perCell) must be positive")
    val w = Window.partitionBy(col("cid"))
    val wr = Window.partitionBy(col("cid"))
      .orderBy(Dedup.h32(col("point_id").cast("string")), col("point_id"))
    assignPoints(points, pointIdCol, vecCol, cents)
      .withColumn("cluster_n", count(lit(1)).over(w))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= perCell)
      .select(col("cid"), col("point_id"), col("cluster_n"), col("rank").cast("long"))
  }

  def prototypicalityPrune(points: DataFrame, pointIdCol: String, vecCol: String,
      cents: DataFrame, keepFrac: Double): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0, s"keepFrac ($keepFrac) must be in (0, 1]")
    val wc = Window.partitionBy(col("cid"))
    val wr = Window.partitionBy(col("cid")).orderBy(col("score"), col("point_id"))
    assignPoints(points, pointIdCol, vecCol, cents)
      .join(broadcast(cents), "cid")
      .withColumn("score", VectorOps.cosine(col("__pv"), col("centroid")))
      .withColumn("cluster_n", count(lit(1)).over(wc))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <=
        greatest(lit(1L), floor(col("cluster_n") * keepFrac).cast("long")))
      .select(col("cid"), col("point_id"), col("cluster_n"), col("rank"),
        round(col("score"), 6).as("score"))
  }

  /** Per-cell embedding outliers — flag points that sit unusually FAR
    * from their own cluster's centroid RELATIVE TO THEIR CELL PEERS
    * (z-score of the cosine-to-centroid within the cell ≤ −`zThresh`).
    * This is the noise/off-topic lens of the cluster data map: where
    * [[prototypicalityPrune]] keeps the hardest examples and
    * [[clusterCards]] reports cohesion, this names the individual docs
    * a curation pass should INSPECT — mislabeled, boilerplate-wrapped,
    * or genuinely out-of-distribution members (the pre-dedup outlier
    * sweep of D4, Tirumala et al. 2023, arXiv:2308.12284). A per-cell
    * z beats a global score cutoff because loose cells (low mean
    * cohesion) would otherwise flood the flag list while tight cells
    * hide their one bad member.
    *
    * Determinism across engines: the score, the cell mean, and the
    * cell stddev are each quantized to 6 dp BEFORE the z division (the
    * DSIR per-cell log-ratio discipline) — the threshold compare then
    * runs on bit-identical doubles in Spark and the SQL oracle, so the
    * flagged SET is exactly reproducible, not just the displayed
    * numbers. Cells with fewer than `minN` members or zero stddev
    * (singletons, duplicates) never flag — a z-score over 2 points is
    * noise, documented rather than guessed at.
    *
    * Scale shape: broadcast centroid assignment (map-side), then ONE
    * `cid` exchange shared by the count/avg/stddev windows — the
    * [[clusterCards]] plan with a filter instead of a rank. Output is
    * the flagged rows only: `(cid, point_id, cluster_n, score,
    * cell_mean, cell_std, z)`.
    */
  def clusterOutliers(points: DataFrame, pointIdCol: String, vecCol: String,
      cents: DataFrame, zThresh: Double = 2.0, minN: Int = 4): DataFrame = {
    require(zThresh > 0.0, s"zThresh ($zThresh) must be positive")
    require(minN >= 2, s"minN ($minN) must be >= 2 — a z-score needs peers")
    val w = Window.partitionBy(col("cid"))
    assignPoints(points, pointIdCol, vecCol, cents)
      .join(broadcast(cents), "cid")
      .withColumn("score", round(VectorOps.cosine(col("__pv"), col("centroid")), 6))
      .withColumn("cluster_n", count(lit(1)).over(w))
      .withColumn("cell_mean", round(avg(col("score")).over(w), 6))
      .withColumn("cell_std", round(stddev_samp(col("score")).over(w), 6))
      .filter(col("cluster_n") >= minN && col("cell_std") > 0.0)
      .withColumn("__z", (col("score") - col("cell_mean")) / col("cell_std"))
      .filter(col("__z") <= -zThresh)
      .select(col("cid"), col("point_id"), col("cluster_n"), col("score"),
        col("cell_mean"), col("cell_std"), round(col("__z"), 4).as("z"))
  }

  /** Matryoshka prefix-dimension search: shortlist by scoring only the
    * FIRST `prefixDim` components of every vector, then rerank the
    * shortlist at full width — the adaptive-retrieval recipe for
    * Matryoshka-trained embeddings (Kusupati et al. 2022, NeurIPS:
    * MRL fronts of the vector carry most of the signal by training),
    * and a useful cost knob even on non-MRL vectors where leading
    * components are merely informative. Cost shape at 100 TB: the
    * corpus-wide pair pass scores a NARROW prefix table (`prefixDim /
    * dim` of the vector bytes; per-query state is `shortlist` rows
    * map-side via WindowGroupLimit), and the full-width cosine runs
    * only on `shortlist` rows per query, fetched by id. With
    * `prefixDim = dim` and `shortlist >=` corpus size
    * this degrades to exact k-NN (pinned in SimilaritySpec).
    * Same two-phase shape as [[bqRerankTopK]], for the same measured
    * reason: whole-stage codegen evaluates stream-side projections
    * lazily inside the nested-loop join's inner loop, so the prefix
    * slice must materialize behind a boundary (one exchange of
    * `prefixDim/dim` of the vector bytes) or it re-slices per PAIR;
    * raw full-width vectors are then fetched BY ID for the shortlist
    * only — they never enter the pair join.
    * Output: `(query_id, rank, point_id, score)` — full-width scores.
    */
  def prefixRerankTopK(
      queries: DataFrame,
      points: DataFrame,
      queryIdCol: String,
      pointIdCol: String,
      vecCol: String,
      prefixDim: Int,
      shortlist: Int,
      k: Int): DataFrame = {
    require(prefixDim >= 1, s"prefixDim ($prefixDim) must be >= 1")
    require(k >= 1 && shortlist >= k,
      s"need shortlist ($shortlist) >= k ($k) >= 1")
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"),
      slice(col(vecCol), 1, prefixDim).as("__qpre")))
    val pre = points
      .select(col(pointIdCol).as("point_id"), slice(col(vecCol), 1, prefixDim).as("__ppre"))
      .repartition(col("point_id"))
    val wPre = Window.partitionBy(col("query_id"))
      .orderBy(desc("__pre_score"), col("point_id").asc)
    val shortIds = pre.crossJoin(q)
      .withColumn("__pre_score", VectorOps.cosine(col("__qpre"), col("__ppre")))
      .withColumn("__prank", row_number().over(wPre))
      .filter(col("__prank") <= shortlist)
      .select(col("query_id"), col("point_id"))
    fetchAndRerank(shortIds, queries, points, queryIdCol, pointIdCol, vecCol, k)
  }

  /** Shared phase 2 of the two-phase compressed-search shape
    * ([[prefixRerankTopK]], [[bqRerankTopK]]): fetch raw full-width
    * vectors BY ID for the shortlisted `(query_id, point_id)` pairs
    * only (broadcast id joins — the point table streams through one
    * hash probe, the wide column never enters a pair join), score with
    * exact cosine, keep top-k per query with the standard
    * `(score DESC, point_id ASC)` total order. One definition so a fix
    * to this load-bearing shape cannot land in only one path.
    */
  private def fetchAndRerank(shortIds: DataFrame, queries: DataFrame,
      points: DataFrame, queryIdCol: String, pointIdCol: String,
      vecCol: String, k: Int): DataFrame = {
    val wFull = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), col("point_id").asc)
    points
      .select(col(pointIdCol).as("point_id"), col(vecCol).as("__pvec"))
      .join(broadcast(shortIds), Seq("point_id"))
      .join(broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(vecCol).as("__qvec"))), Seq("query_id"))
      .withColumn("score", VectorOps.cosine(col("__qvec"), col("__pvec")))
      .withColumn("rank", row_number().over(wFull).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("point_id"), col("score"))
  }

  /** Pack the sign bit of each vector component into 32-bit words
    * (`ARRAY<BIGINT>`, `ceil(dim/32)` entries, bit `31 - (i mod 32)` of
    * word `i / 32` set iff `v[i] > 0`) — the binary-quantization
    * signature. 32-bit words keep every sum positive (no BIGINT
    * sign-bit edge in either engine) and generalize to any width. A
    * pure codegen projection: `dim` conditional adds, no UDF.
    */
  def packSignBits(vecCol: Column, dim: Int): Column = {
    require(dim >= 1, s"dim ($dim) must be >= 1")
    val words = (0 until (dim + 31) / 32).map { w =>
      (w * 32 until math.min(dim, (w + 1) * 32))
        .map(i => when(element_at(vecCol, i + 1) > 0.0f,
          lit(1L << (31 - (i % 32)))).otherwise(lit(0L)))
        .reduce(_ + _)
    }
    array(words: _*)
  }

  /** Hamming distance between two packed signatures: popcount of the
    * per-word XOR, summed — 2 instructions per 32 components. The HOF
    * form works for any width; [[hammingUnrolled]] is the hot-path
    * variant when the word count is known at plan time (zip_with /
    * aggregate lambdas evaluate interpreted — measured 2x slower per
    * pair than the unrolled builtins, which stay in codegen).
    */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** [[hamming]] with the word loop unrolled for a known `dim` — pure
    * codegen builtins (element_at / xor / bit_count), no lambdas.
    */
  def hammingUnrolled(a: Column, b: Column, dim: Int): Column =
    (0 until (dim + 31) / 32)
      .map(w => bit_count(element_at(a, w + 1).bitwiseXOR(element_at(b, w + 1))).cast("long"))
      .reduce(_ + _)

  /** Binary-quantization search: Hamming shortlist over 1-bit sign
    * signatures, then full-width cosine re-rank — the cheapest
    * corpus-wide pass in the ANN menu (the BQ recipe modern vector
    * stores ship as "binary quantization": sign(cos angle) agreement
    * concentrates for high-dim vectors, so Hamming on signs tracks
    * cosine order well enough to over-retrieve from). Cost shape at
    * 100 TB: the signature column is dim/32 longs — 16x smaller than
    * the float vector it summarizes — so the corpus-wide pass reads a
    * fraction of the bytes and spends 2 ALU ops per 32 components vs
    * 32 FMAs; materialize the signature at ingest ([[packSignBits]]
    * is a plain column) and the raw vector column is fetched BY ID
    * for the `shortlist` survivors per query only (phase 2 below, the
    * [[graft.ops.Pq.adcRerank]] broadcast-join discipline). Broadcast
    * + WindowGroupLimit shapes for the pair pass; the only point-side
    * movement is one ~16-byte/row exchange of the signature table
    * (see the in-body comment for why that boundary is load-bearing).
    * Output: `(query_id, rank, point_id, score)` — full-width cosine
    * scores; shortlist ties broken `(hamming ASC, point_id ASC)`,
    * final ties `(score DESC, point_id ASC)`.
    */
  def bqRerankTopK(
      queries: DataFrame,
      points: DataFrame,
      queryIdCol: String,
      pointIdCol: String,
      vecCol: String,
      dim: Int,
      shortlist: Int,
      k: Int): DataFrame = {
    require(k >= 1 && shortlist >= k,
      s"need shortlist ($shortlist) >= k ($k) >= 1")
    // Phase 1 — Hamming shortlist over the NARROW signature table
    // (point_id + dim/32 longs; the raw vector column never enters the
    // pair join). The repartition below the pack projection is
    // deliberate and load-bearing: whole-stage codegen evaluates a
    // stream-side projection LAZILY inside the nested-loop join's
    // inner loop, so without a materialization boundary packSignBits
    // runs once per PAIR, not per point — measured 48 s vs 6 s for the
    // same join at the 100x smoke (SCALING.md round 11). The exchange
    // shuffles only ~16 bytes/row — at any corpus size this is the
    // cheapest boundary that forces one-pack-per-row; a production
    // deployment materializes signatures at ingest and skips it.
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"),
      packSignBits(col(vecCol), dim).as("__qsig")))
    val sigs = points
      .select(col(pointIdCol).as("point_id"), packSignBits(col(vecCol), dim).as("__psig"))
      .repartition(col("point_id"))
    val wPre = Window.partitionBy(col("query_id"))
      .orderBy(col("__ham").asc, col("point_id").asc)
    val shortIds = sigs.crossJoin(q)
      .withColumn("__ham", hammingUnrolled(col("__qsig"), col("__psig"), dim))
      .withColumn("__hrank", row_number().over(wPre))
      .filter(col("__hrank") <= shortlist)
      .select(col("query_id"), col("point_id"))
    // Phase 2 — shared with prefixRerankTopK: [[fetchAndRerank]]
    fetchAndRerank(shortIds, queries, points, queryIdCol, pointIdCol, vecCol, k)
  }

  /** [[bqRerankTopK]] against a PRE-MATERIALIZED signature table — the
    * ingest-time index that method's in-body comment prescribes for a
    * production deployment. `sigPoints` carries `(pointIdCol, sigCol)`
    * with `sigCol = packSignBits(vec, dim)` computed ONCE at write time
    * (a plain column, so any ingest path can emit it); the pair pass
    * then reads ~16 bytes/row straight off the scan with NO per-batch
    * pack projection and NO point-side exchange — the per-pair
    * lazy-projection hazard the in-plan form must fence with a
    * repartition cannot arise, because a scan attribute is a
    * materialized value, not a deferred expression (plan-pinned in
    * BucketingSpec: zero point-side hash exchanges). Phase 2 fetches
    * raw vectors BY ID from `points` via the shared [[fetchAndRerank]].
    * Equivalent to [[bqRerankTopK]] row for row (SimilaritySpec pin);
    * at 100 TB the difference is one 16x-smaller-than-vector column
    * scan per batch instead of pack + shuffle of the whole corpus.
    */
  def bqRerankTopKStored(
      queries: DataFrame,
      sigPoints: DataFrame,
      points: DataFrame,
      queryIdCol: String,
      pointIdCol: String,
      vecCol: String,
      sigCol: String,
      dim: Int,
      shortlist: Int,
      k: Int): DataFrame = {
    require(k >= 1 && shortlist >= k,
      s"need shortlist ($shortlist) >= k ($k) >= 1")
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"),
      packSignBits(col(vecCol), dim).as("__qsig")))
    val wPre = Window.partitionBy(col("query_id"))
      .orderBy(col("__ham").asc, col("point_id").asc)
    val shortIds = sigPoints
      .select(col(pointIdCol).as("point_id"), col(sigCol).as("__psig"))
      .crossJoin(q)
      .withColumn("__ham", hammingUnrolled(col("__qsig"), col("__psig"), dim))
      .withColumn("__hrank", row_number().over(wPre))
      .filter(col("__hrank") <= shortlist)
      .select(col("query_id"), col("point_id"))
    fetchAndRerank(shortIds, queries, points, queryIdCol, pointIdCol, vecCol, k)
  }

  /** [[prefixRerankTopK]] against a PRE-MATERIALIZED prefix table —
    * the Matryoshka twin of [[bqRerankTopKStored]]: `prePoints` carries
    * `(pointIdCol, preCol)` with `preCol = slice(vec, 1, prefixDim)`
    * written at ingest, so the corpus-wide pair pass scans the narrow
    * prefix column directly (no per-batch slice projection, no
    * point-side exchange — same plan-pin). `prefixDim` must equal the
    * stored prefix width (the query side slices its own vectors to
    * match). Phase 2 is the shared [[fetchAndRerank]] by-id fetch from
    * the raw `points` table.
    */
  def prefixRerankTopKStored(
      queries: DataFrame,
      prePoints: DataFrame,
      points: DataFrame,
      queryIdCol: String,
      pointIdCol: String,
      vecCol: String,
      preCol: String,
      prefixDim: Int,
      shortlist: Int,
      k: Int): DataFrame = {
    require(prefixDim >= 1, s"prefixDim ($prefixDim) must be >= 1")
    require(k >= 1 && shortlist >= k,
      s"need shortlist ($shortlist) >= k ($k) >= 1")
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"),
      slice(col(vecCol), 1, prefixDim).as("__qpre")))
    val wPre = Window.partitionBy(col("query_id"))
      .orderBy(desc("__pre_score"), col("point_id").asc)
    val shortIds = prePoints
      .select(col(pointIdCol).as("point_id"), col(preCol).as("__ppre"))
      .crossJoin(q)
      .withColumn("__pre_score", VectorOps.cosine(col("__qpre"), col("__ppre")))
      .withColumn("__prank", row_number().over(wPre))
      .filter(col("__prank") <= shortlist)
      .select(col("query_id"), col("point_id"))
    fetchAndRerank(shortIds, queries, points, queryIdCol, pointIdCol, vecCol, k)
  }

  /** Index-quality evaluation: per-query recall@k of an approximate hit
    * table against the exact ground truth (both as (queryCol, pointCol)
    * rows, e.g. [[ivfTrainedTopK]] vs [[graft.ops.Knn.knnJoin]]). This
    * is the operator an ANN deployment tunes `nprobe`/`kCentroids`
    * with: run it on a sampled query set, move the knobs, re-measure.
    * Queries whose approximate hits miss entirely report 0.0 (a left
    * join — silently dropping them would overstate recall). One
    * semi-join + one aggregation, both on query_id; at scale the
    * sampled query set is small by construction.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, queryCol: String,
      pointCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val e = exact.select(col(queryCol).as("query_id"), col(pointCol).as("point_id"))
    val a = approx.select(col(queryCol).as("query_id"), col(pointCol).as("point_id"))
    val hits = e.join(a, Seq("query_id", "point_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("__hits"))
    e.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("__hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("__hits"), lit(0L)).cast("double") / k, 6).as("recall_at_k"))
  }

  /** Embedding near-duplicate pairs: all pairs above a cosine threshold,
    * pruned by the same sign-bucket (candidates must share the bucket —
    * documented recall trade-off; brute-force variant sets bits=0).
    *
    * Hot-bucket cap, same discipline as [[Dedup.lshCandidates]]: a
    * degenerate embedding cluster (a collapsed encoder emitting
    * near-constant vectors, zero-padded rows) lands k members in ONE
    * bucket and the join scores k²/2 pairs. Buckets larger than
    * `maxBucketSize` are excluded from the join; the size window
    * partitions on the same bucket key the join shuffles on, so the
    * guard reuses that exchange rather than adding one. `bits = 0` is
    * the EXPLICIT all-pairs mode (the exact/oracle form) — the guard
    * deliberately does not apply there.
    */
  def cosineNearDup(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bits: Int,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    require(maxBucketSize >= 2,
      s"maxBucketSize ($maxBucketSize) must be >= 2 — no bucket could pair")
    val v = vectors.withColumn("__bucket",
      if (bits > 0) signBucket(vecCol, bits) else lit(0L))
    val guarded = if (bits > 0) bucketSizeGuard(v, maxBucketSize) else v
    bucketPairJoin(guarded, idCol, vecCol, threshold)
  }

  /** Hot-bucket guard over a frame carrying `__bucket`: the size window
    * partitions on the same key the pair join shuffles on, so the guard
    * reuses that exchange rather than adding one.
    */
  private def bucketSizeGuard(v: DataFrame, maxBucketSize: Int): DataFrame = {
    val w = Window.partitionBy(col("__bucket"))
    v.withColumn("__bsz", count(lit(1)).over(w))
      .filter(col("__bsz") <= maxBucketSize)
  }

  /** Within-bucket pair scoring over a frame carrying `__bucket` —
    * the shared tail of [[cosineNearDup]] and [[cosineNearDupVol]].
    */
  private def bucketPairJoin(guarded: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = guarded.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("__bucket"))
    val b = guarded.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("__bucket"))
    a.join(b, "__bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", VectorOps.cosine(col("va"), col("vb")))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }

  /** Upper bound on [[volumeSizedBits]]: the dynamic bucket reads the
    * sign bits of the leading `MaxDynBits` vector components, so the
    * embedding dim must be ≥ this (element_at past the array end is an
    * ANSI error, not a silent null). 2^16 = 65,536 buckets is also
    * where a data-independent sign quantizer stops being the right tool
    * — past that, train centroids (see the object scaladoc).
    */
  val MaxDynBits = 16

  /** Volume-sized sign-bucket width: the number of bucket bits that puts
    * the EXPECTED bucket population in [targetBucket/2, targetBucket),
    * computed IN-PLAN from a corpus-count column —
    * `bits = bitLength(n div targetBucket)` clamped to
    * `[minBits, maxBits]`. Integer-exact (integral `div` + the length
    * of the `bin` string — no float `log2` whose half-ulp at an exact
    * power of two could round differently across engines), so the
    * DuckDB oracle reproduces it bit for bit.
    *
    * This is [[graft.VolumeConf]]'s shuffle-sizing discipline applied
    * to the quantizer knob itself: a fixed `bits` that is right at
    * verify scale saturates the hot-bucket guard three decades up
    * (measured, SCALING.md: bits=4 at 2M vectors puts ~125k members in
    * every one of the 16 buckets, the guard excludes them all, recall
    * collapses to zero). The knob must grow with the data — in-plan,
    * from a 1-row broadcast count, never from an env var or a
    * driver-side action.
    */
  def volumeSizedBits(n: Column, targetBucket: Int,
      minBits: Int = 4, maxBits: Int = MaxDynBits): Column = {
    require(targetBucket >= 2, s"targetBucket ($targetBucket) must be >= 2")
    require(1 <= minBits && minBits <= maxBits && maxBits <= MaxDynBits,
      s"need 1 <= minBits ($minBits) <= maxBits ($maxBits) <= $MaxDynBits")
    least(lit(maxBits), greatest(lit(minBits),
      length(bin(greatest(
        call_function("div", n.cast("long"), lit(targetBucket.toLong)),
        lit(1L)))).cast("int")))
  }

  /** [[cosineNearDup]] with the bucket width SELF-SIZED from the corpus
    * volume ([[volumeSizedBits]]): the count is a 1-row broadcast
    * aggregate and the bucket is the top `bits` bits of the static
    * [[MaxDynBits]]-bit sign bucket (one integer shift — coarser widths
    * are exact prefixes of finer ones, so the only dynamic piece of the
    * quantizer is the shift amount). Requires embedding dim ≥
    * [[MaxDynBits]]. The hot-bucket guard still applies, but volume
    * sizing is what keeps it a degenerate-cluster backstop instead of
    * the recall cliff a fixed width turns it into at scale.
    */
  def cosineNearDupVol(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      targetBucket: Int = 256,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    require(maxBucketSize >= 2,
      s"maxBucketSize ($maxBucketSize) must be >= 2 — no bucket could pair")
    val n = vectors.agg(count(lit(1)).cast("long").as("__n"))
    val v = vectors.crossJoin(broadcast(n))
      .withColumn("__bucket", call_function("shiftright",
        signBucket(vecCol, MaxDynBits),
        lit(MaxDynBits) - volumeSizedBits(col("__n"), targetBucket)))
      .drop("__n")
    bucketPairJoin(bucketSizeGuard(v, maxBucketSize), idCol, vecCol, threshold)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, SemDeDup:
    * cluster embeddings, drop all but one member of every near-duplicate
    * group): [[cosineNearDup]] pairs above the threshold are collapsed to
    * connected components and the min-id member of each component is the
    * kept representative. Output: every id with its `cluster_id` and a
    * `keep` flag (filter on `keep` for the surviving corpus).
    *
    * Scale shape: bucket-pruned pair join (never N² scoring) + label
    * propagation over id-sized tables. `iterations <= 0` (the default)
    * runs [[Dedup.clusterLabelsConverged]] — the production mode, exact
    * for any component diameter; a positive value runs the fixed
    * `iterations`-round unroll, which is what the static-SQL oracle can
    * express (`sim_semdedup`) but splits components longer than
    * `iterations` hops.
    */
  def semanticDedup(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int, iterations: Int = 0): DataFrame =
    semDedupFromPairs(vectors, idCol,
      cosineNearDup(vectors, idCol, vecCol, threshold, bits), iterations)

  /** [[semanticDedup]] over [[cosineNearDupVol]] candidates — the form
    * whose quantizer width grows with the corpus instead of saturating
    * the hot-bucket guard at a fixed 2^bits (the `sim_semdedup` 1000×
    * lesson: bits=4 at 2M vectors excludes every bucket and keeps all
    * 2M rows as singletons). Same output contract as [[semanticDedup]].
    */
  def semanticDedupVol(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, targetBucket: Int = 256, iterations: Int = 0,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize): DataFrame =
    semDedupFromPairs(vectors, idCol,
      cosineNearDupVol(vectors, idCol, vecCol, threshold, targetBucket, maxBucketSize),
      iterations)

  /** Shared label-propagation + min-id-keep tail of the two
    * semantic-dedup fronts (every id keeps its row; members of excluded
    * hot buckets simply contribute no pairs and stay singletons).
    */
  private def semDedupFromPairs(vectors: DataFrame, idCol: String,
      nearDupPairs: DataFrame, iterations: Int): DataFrame = {
    val pairs = nearDupPairs.select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val ids = vectors.select(col(idCol))
    val labels =
      if (iterations <= 0) Dedup.clusterLabelsConverged(ids, idCol, pairs)
      else Dedup.clusterLabels(ids, idCol, pairs, iterations)
    labels
      .withColumn("keep", col("cluster_id") === col("doc_id"))
      .select(col("doc_id").as("id"), col("cluster_id"), col("keep"))
  }
}
