package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IR-metrics evaluation — `evaluate_mrr_at_k` (`Qdrant/llm.py:138-163`):
  * Recall@k and MRR@k over law-section numbers extracted from free text.
  * The reference's per-row pandas loop becomes one narrow projection plus
  * a single global aggregate — one stage + reduce.
  *
  * Semantics preserved (SURVEY §2.6):
  *  - E1: `re.findall(r'\d+')` → `regexp_extract_all` (order-preserving);
  *  - E2: gold is a SET (`array_distinct`); pred keeps list order;
  *  - E3: pred head-k slice BEFORE rank/recall;
  *  - E4/E5: rank of first relevant prediction, reciprocal rank 0.0 when
  *    none (`Qdrant/llm.py:150-156`);
  *  - E6: recall = |gold ∩ pred_k| / |gold|, 0.0 on empty gold
  *    (`Qdrant/llm.py:157`) — `array_intersect` dedups, matching Python's
  *    `set(pred)` coercion;
  *  - E8: macro averages, 0.0 on an empty frame (`Qdrant/llm.py:160-163`).
  */
object Eval {

  /** E1: ordered digit-runs of a string, null-safe. `\p{Nd}+`, not
    * `[0-9]+`: Python's `re.findall(r'\d+', …)` (`Qdrant/llm.py:139-140`)
    * matches ANY unicode decimal digit — on Thai legal text that includes
    * Thai numerals ๐-๙, which `[0-9]` would silently drop. Java and
    * DuckDB's RE2 both support the `\p{Nd}` general category, so the
    * oracle stays in lockstep.
    */
  def extractNumbers(c: Column): Column =
    regexp_extract_all(coalesce(c, lit("")), lit("\\p{Nd}+"), lit(0))

  /** E4: 1-based rank of the first prediction present in gold, else NULL.
    * (`array_position` returns 0 for "not found" — normalized to NULL so
    * `1/rank` stays null-safe, mirroring Python's `None`.)
    */
  def firstRelevantRank(gold: Column, predK: Column): Column =
    nullif(array_position(transform(predK, p => array_contains(gold, p)), lit(true)), lit(0L))

  /** Adds `recall_at_k` and `mrr_at_k` DOUBLE columns computed from two
    * free-text columns (gold answers, predicted text).
    */
  def withMetrics(df: DataFrame, answersCol: String, predCol: String, k: Int): DataFrame = {
    val gold = array_distinct(extractNumbers(col(answersCol)))
    val predK = slice(extractNumbers(col(predCol)), 1, k)
    val rank = firstRelevantRank(gold, predK)
    df.withColumn(
        "recall_at_k",
        when(size(gold) === 0, lit(0.0d))
          .otherwise(size(array_intersect(gold, predK)).cast("double") / size(gold).cast("double")))
      .withColumn("mrr_at_k", coalesce(lit(1.0d) / rank.cast("double"), lit(0.0d)))
  }

  /** nDCG@k with binary relevance over an already-ranked hit table
    * `(queryCol, rankCol, relCol)` — the ranking-quality metric the
    * Recall/MRR pair doesn't capture: it credits EVERY relevant hit by
    * position (MRR sees only the first), normalized by the best
    * achievable ordering of the same result set, so 1.0 means "all
    * relevant hits ranked first". The retrieval-tuning companion to
    * [[graft.ops.SimilaritySearch.recallAtK]].
    *
    * Determinism: DCG and IDCG are sequential folds over rank-sorted
    * arrays, NOT floating `sum()` aggregates whose addition order
    * depends on partitioning — the discipline every oracle-checked
    * double here follows. `n_rel = 0` short-circuits IDCG to 0 (a
    * `sequence(1, 0)` would count DOWN in Spark) and nDCG to 0.0.
    * One groupBy on the query key; k is whatever the hit table was
    * truncated to upstream.
    */
  def ndcgAtK(hits: DataFrame, queryCol: String, rankCol: String, relCol: String): DataFrame = {
    val pairs = sort_array(collect_list(struct(
      col(rankCol).cast("long").as("r"), col(relCol).cast("double").as("rel"))))
    hits.groupBy(col(queryCol).as("query_id"))
      .agg(pairs.as("__ps"), sum(col(relCol).cast("long")).as("n_rel"))
      .select(col("query_id"), col("n_rel"),
        aggregate(col("__ps"), lit(0.0d),
          (acc, p) => acc + p.getField("rel") / log2(p.getField("r").cast("double") + lit(1.0d)))
          .as("__dcg"),
        when(col("n_rel") >= 1,
            aggregate(sequence(lit(1L), col("n_rel")), lit(0.0d),
              (acc, i) => acc + lit(1.0d) / log2(i.cast("double") + lit(1.0d))))
          .otherwise(lit(0.0d)).as("__idcg"))
      .select(col("query_id"), col("n_rel"),
        round(col("__dcg"), 6).as("dcg"),
        round(when(col("__idcg") > 0, col("__dcg") / col("__idcg")).otherwise(lit(0.0d)), 6)
          .as("ndcg"))
  }

  /** Average precision at k (per query) — the third standard IR
    * quality axis next to recall@k (set coverage, position-blind) and
    * nDCG (graded, log-discounted): AP averages precision AT EACH
    * relevant position, so it rewards placing every relevant hit
    * early, not just the first (MRR) or any (recall). AP =
    * (1/D) Σ_i rel_i · (cum_rel_i / i) over the retrieved ranking;
    * queries with no relevant hit report 0.0.
    *
    * THE NORMALIZER D IS A SEMANTIC CHOICE. With `totalRelCol` (a
    * per-query-constant column on `hits` holding the TOTAL relevant
    * count R in the corpus) and the cutoff `k`, D = min(R, k) — the
    * standard AP@k, which a query retrieving 1 of many relevant docs
    * cannot max out. WITHOUT it, D = n_rel (relevant hits actually
    * retrieved within top-k): "precision averaged over the
    * retrieved-relevant positions" — recall-BLIND (one relevant hit at
    * rank 1 scores 1.0 regardless of what was missed), useful only
    * when R is unknowable; prefer the normalized form whenever gold
    * counts exist.
    *
    * THE CUTOFF k APPLIES IN BOTH FORMS: any `k >= 1` truncates the
    * ranking at rank k before terms accumulate (so the unnormalized
    * D = n_rel counts relevant hits within the top-k, as stated
    * above); `k = 0` (only legal without `totalRelCol`) means "no
    * cutoff" — plain AP over the full retrieved ranking.
    *
    * Numerics: cumulative hit counts are exact integers from a
    * partitioned window, and the final sum is a SEQUENTIAL
    * ascending-rank fold (the [[ndcgAtK]] discipline), so any engine
    * folding the same way is bit-identical pre-rounding. Output:
    * `(query_id, n_rel, ap)`; mean over queries = MAP.
    */
  def apAtK(hits: DataFrame, queryCol: String, rankCol: String, relCol: String,
      totalRelCol: Option[String] = None, k: Int = 0): DataFrame = {
    require(k >= 0, s"apAtK: the cutoff k ($k) must be >= 0 (0 = no cutoff)")
    require(totalRelCol.isEmpty || k >= 1,
      s"apAtK: the cutoff k ($k) must be >= 1 when totalRelCol is given — " +
        "the standard normalizer is min(total relevant, k)")
    val w = Window.partitionBy(col("query_id")).orderBy(col("r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = hits.select(col(queryCol).as("query_id") +:
        col(rankCol).cast("long").as("r") +: col(relCol).cast("long").as("rel") +:
        totalRelCol.map(c => col(c).cast("long").as("__tr")).toSeq: _*)
    // AP@k truncates the RANKING at k, so with the min(R, k) normalizer
    // rows past rank k must not contribute terms — a caller passing a
    // deeper hit table would otherwise accumulate every relevant
    // position while still dividing by min(R, k), silently inflating
    // the score above the metric's definition (it could even exceed
    // 1.0). The truncation is a property of k, not of the normalizer
    // choice: the unnormalized form with k >= 1 is "AP over the top-k
    // retrieved" (D = n_rel within the cutoff); only k = 0 keeps the
    // full ranking. The cutoff is applied CONDITIONALLY (null/zero out
    // beyond-cutoff rows) rather than by pre-filtering, so the groupBy
    // still sees every input query: a query whose retrieved ranks all
    // exceed k keeps its output row with the documented n_rel = 0 /
    // ap = 0.0 (exactly what zero within-k relevant hits scores) — one
    // row per input query, always, in ONE pass over the hits (no
    // second scan + re-attach join for the query universe). The
    // cumulative window needs no guard: at any kept rank r <= k it
    // only ever sums rows ranked <= r, all within the cutoff.
    val inCut = if (k >= 1) col("r") <= k.toLong else lit(true)
    val terms = all.withColumn("__term",
      when(inCut,
        col("rel").cast("double") * sum(col("rel")).over(w).cast("double") /
          col("r").cast("double")))
    // collect_list skips null inputs, so beyond-cutoff rows (null
    // struct) neither occupy per-query memory nor contribute terms.
    val aggs = sum(when(inCut, col("rel")).otherwise(lit(0L))).as("n_rel") +:
      sort_array(collect_list(when(inCut,
        struct(col("r"), col("__term").as("t"))))).as("__ps") +:
      totalRelCol.map(_ => min(col("__tr")).as("__tr")).toSeq
    val denom = totalRelCol match {
      case None => col("n_rel").cast("double")
      case Some(_) => least(col("__tr"), lit(k.toLong)).cast("double")
    }
    terms.groupBy(col("query_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("query_id"), col("n_rel"),
        round(when(col("n_rel") >= 1,
            aggregate(col("__ps"), lit(0.0d), (acc, p) => acc + p.getField("t")) /
              denom)
          .otherwise(lit(0.0d)), 6).as("ap"))
  }

  /** E8: macro averages; 0.0 on empty input for parity with the
    * reference's `sum/len or 0.0`.
    */
  def macroAverages(withMetricCols: DataFrame): DataFrame =
    withMetricCols.agg(
      coalesce(avg(col("recall_at_k")), lit(0.0d)).as("avg_recall_at_k"),
      coalesce(avg(col("mrr_at_k")), lit(0.0d)).as("avg_mrr_at_k"))

  /** Harness-data instantiation of the evaluation pipeline: per user,
    * gold = the JSON `k` values of purchase events, prediction = the
    * `k` values of all events in time order — then Recall@5 / MRR@5 from
    * the two STRINGS, exercising the digit-extraction path (E1) exactly
    * as the reference does on LLM output text.
    */
  def evalFrameOnEvents(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .withColumn("kv", get_json_object(col("props"), "$.k"))
    def orderedJoin(df: DataFrame, sep: String, as: String): DataFrame =
      df.groupBy(col("user_id"))
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("kv").as("v")))),
            s => s.getField("v")),
          sep).as(as))
    val gold = orderedJoin(ev.filter(col("event_type") === "purchase"), ", ", "answers")
    val pred = orderedJoin(ev, " ", "predicted")
    withMetrics(gold.join(pred, "user_id"), "answers", "predicted", 5)
  }

  def evalPerRow(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame =
    evalFrameOnEvents(spark, sfDir)
      .select(
        col("user_id"),
        round(col("recall_at_k"), 6).as("recall_at_k"),
        round(col("mrr_at_k"), 6).as("mrr_at_k"))
      .orderBy(col("user_id"))

  def evalMacro(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame =
    macroAverages(evalFrameOnEvents(spark, sfDir))
      .select(
        round(col("avg_recall_at_k"), 6).as("avg_recall_at_k"),
        round(col("avg_mrr_at_k"), 6).as("avg_mrr_at_k"))
}
