package graft

import graft.ops.Eval

/** Evaluation edge semantics from `Qdrant/llm.py:138-163` (FIXTURES §A5). */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(answers: String, pred: String, k: Int = 5): (Double, Double) = {
    val df = Seq((answers, pred)).toDF("answers", "predicted")
    val r = Eval.withMetrics(df, "answers", "predicted", k).first()
    (r.getAs[Double]("recall_at_k"), r.getAs[Double]("mrr_at_k"))
  }

  test("E6: empty gold → recall 0.0 (not NaN/null)") {
    assert(metrics("no digits here", "1, 2, 3") == (0.0, 0.0))
  }

  test("E5: no relevant prediction → mrr 0.0") {
    assert(metrics("10, 20", "1, 2, 3") == (0.0, 0.0))
  }

  test("E4: hit at rank 1 vs rank k") {
    assert(metrics("10, 20", "10, 99")._2 == 1.0)
    assert(metrics("10, 20", "1, 2, 3, 4, 10")._2 == 0.2)
  }

  test("E3: prediction beyond k is ignored") {
    assert(metrics("10", "1, 2, 3, 4, 5, 10") == (0.0, 0.0))
  }

  test("E2/E6: duplicate numbers — gold deduped, pred positions count") {
    // gold {10,20}; pred [10,10,20] → recall 2/2, mrr 1.0
    assert(metrics("10, 20, 20", "10 10 20") == (1.0, 1.0))
  }

  test("E6: recall is fraction of gold covered by top-k") {
    assert(metrics("10, 20, 30, 40", "10 20 99") == (0.5, 1.0))
  }

  test("E1: digit runs extracted from arbitrary text (thai-style mixed)") {
    assert(metrics("มาตรา 112 และ 33", "คำตอบ: มาตรา 33") == (0.5, 1.0))
  }

  test("E1: thai numerals ๐-๙ are digit runs, like python's unicode \\d+") {
    // `re.findall(r'\d+')` matches Thai digits (`Qdrant/llm.py:139-140`);
    // gold {๒๐, 112}; pred [๒๐] → recall 1/2, first hit at rank 1
    assert(metrics("มาตรา ๒๐ และ 112", "คำตอบ: มาตรา ๒๐") == (0.5, 1.0))
    // mixed-script runs stay separate tokens: "๒๐" ≠ "20"
    assert(metrics("มาตรา ๒๐", "มาตรา 20") == (0.0, 0.0))
  }

  test("E8: empty frame → macro averages 0.0") {
    val empty = Seq.empty[(String, String)].toDF("answers", "predicted")
    val r = Eval.macroAverages(Eval.withMetrics(empty, "answers", "predicted", 5)).first()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
  }

  test("nDCG: hand-computed values, ideal ordering, and the zero-relevant guard") {
    // q1: rel at ranks 1 and 3 → dcg = 1/log2(2) + 1/log2(4) = 1.5;
    //     idcg = 1/log2(2) + 1/log2(3) = 1.630930; ndcg = 0.919721
    // q2: all relevant in order → ndcg = 1.0 exactly
    // q3: nothing relevant → dcg = idcg = 0 → ndcg = 0.0 (guard, not NaN)
    val hits = Seq(
      (1L, 1L, 1), (1L, 2L, 0), (1L, 3L, 1),
      (2L, 1L, 1), (2L, 2L, 1),
      (3L, 1L, 0), (3L, 2L, 0)).toDF("query_id", "rank", "rel")
    val m = Eval.ndcgAtK(hits, "query_id", "rank", "rel")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(m(1L) == ((2L, 1.5, 0.919721)), s"q1: ${m(1L)}")
    assert(m(2L) == ((2L, 1.630930, 1.0)), s"q2: ${m(2L)}")
    assert(m(3L) == ((0L, 0.0, 0.0)), s"q3: ${m(3L)}")
  }

  test("AP: hand-computed values, perfect ordering, zero-relevant guard, partition-invariant") {
    // q1: rel at ranks 1 and 3 → ap = (1/1 + 2/3) / 2 = 0.833333
    // q2: all relevant in order → ap = 1.0 exactly
    // q3: nothing relevant → 0.0 (guard, not NaN)
    // q4: rel only at rank 3 → ap = (1/3) / 1 = 0.333333 (MRR-like tail)
    val hits = Seq(
      (1L, 1L, 1), (1L, 2L, 0), (1L, 3L, 1),
      (2L, 1L, 1), (2L, 2L, 1),
      (3L, 1L, 0), (3L, 2L, 0),
      (4L, 1L, 0), (4L, 2L, 0), (4L, 3L, 1)).toDF("query_id", "rank", "rel")
    val m = Eval.apAtK(hits, "query_id", "rank", "rel")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(m(1L) == ((2L, 0.833333)), s"q1: ${m(1L)}")
    assert(m(2L) == ((2L, 1.0)), s"q2: ${m(2L)}")
    assert(m(3L) == ((0L, 0.0)), s"q3: ${m(3L)}")
    assert(m(4L) == ((1L, 0.333333)), s"q4: ${m(4L)}")
    def at(parts: Int) =
      Eval.apAtK(hits.repartition(parts), "query_id", "rank", "rel")
        .orderBy("query_id").collect().toSeq
    assert(at(1) == at(7), "ap must not depend on how rows are partitioned")
  }

  test("AP@k with total-relevant normalization: retrieving 1 of many cannot score 1.0") {
    // The ADVICE r11 scenario: a query retrieving exactly one of its
    // R=10 relevant docs, at rank 1. The un-normalized form (D = n_rel)
    // reads 1.0 — recall-blind; standard AP@k divides by min(R, k).
    val hits = Seq(
      (1L, 1L, 1, 10L), (1L, 2L, 0, 10L), (1L, 3L, 0, 10L),
      (2L, 1L, 1, 2L), (2L, 2L, 1, 2L), // both of R=2 retrieved in order
      (3L, 1L, 0, 1L)) // R=1, missed entirely
      .toDF("query_id", "rank", "rel", "total_rel")
    val m = Eval.apAtK(hits, "query_id", "rank", "rel",
        totalRelCol = Some("total_rel"), k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(m(1L) == ((1L, 0.2)), s"q1 must score 1/min(10,5) = 0.2: ${m(1L)}")
    assert(m(2L) == ((2L, 1.0)), s"q2 (perfect) must stay 1.0: ${m(2L)}")
    assert(m(3L) == ((0L, 0.0)), s"q3 (missed): ${m(3L)}")
    // and the un-normalized form on q1 reads 1.0 — the documented
    // recall-blind legacy semantics, preserved behind the default
    val un = Eval.apAtK(hits.filter($"query_id" === 1L), "query_id", "rank", "rel")
      .first().getDouble(2)
    assert(un == 1.0, s"un-normalized AP must stay n_rel-relative: $un")
  }

  test("AP@k truncates a deeper hit table at rank k (ADVICE r12)") {
    // rel at ranks 1 and 7 with R=2, k=5: the rank-7 hit is OUTSIDE
    // the cutoff, so AP@5 = (1/1)/min(2,5) = 0.5 and n_rel counts
    // within-k hits only. Before the truncation fix the term 2/7
    // leaked in while the normalizer stayed min(R, k) — 0.642857,
    // above the metric's definition.
    val deep = Seq(
      (1L, 1L, 1, 2L), (1L, 2L, 0, 2L), (1L, 3L, 0, 2L), (1L, 4L, 0, 2L),
      (1L, 5L, 0, 2L), (1L, 6L, 0, 2L), (1L, 7L, 1, 2L), (1L, 8L, 0, 2L))
      .toDF("query_id", "rank", "rel", "total_rel")
    val r = Eval.apAtK(deep, "query_id", "rank", "rel",
        totalRelCol = Some("total_rel"), k = 5).first()
    assert(r.getLong(1) == 1L, s"n_rel must count within-k hits only: $r")
    assert(r.getDouble(2) == 0.5, s"AP@5 must ignore the rank-7 hit: $r")
  }

  test("AP@k truncation applies to the UNNORMALIZED form too (r14 branch)") {
    // Same deep table, no totalRelCol: with k = 5 the rank-7 hit is
    // outside the cutoff, so D = n_rel WITHIN the top-k = 1 and
    // AP@5 = (1/1)/1 = 1.0. Before the r14 truncation the term 2/7
    // leaked in (n_rel = 2, ap = 0.642857) — this pins the branch for
    // the default form, which no prior case exercised with k >= 1.
    val deep = Seq(
      (1L, 1L, 1), (1L, 2L, 0), (1L, 3L, 0), (1L, 4L, 0),
      (1L, 5L, 0), (1L, 6L, 0), (1L, 7L, 1), (1L, 8L, 0))
      .toDF("query_id", "rank", "rel")
    val r = Eval.apAtK(deep, "query_id", "rank", "rel", k = 5).first()
    assert(r.getLong(1) == 1L, s"unnormalized n_rel must truncate at k: $r")
    assert(r.getDouble(2) == 1.0, s"unnormalized AP@5 must ignore rank 7: $r")
  }

  test("AP@k emits ap = 0.0 for a query whose hits ALL sit past the cutoff") {
    // q1 scores normally; q2's only hits are at ranks 6-7 > k = 5, so
    // the cutoff filter removes every q2 row — the output must still
    // carry q2 with (n_rel = 0, ap = 0.0) instead of dropping it, or a
    // MAP computed as the mean over output rows is silently inflated.
    val hits = Seq(
      (1L, 1L, 1, 2L), (1L, 2L, 1, 2L),
      (2L, 6L, 1, 2L), (2L, 7L, 1, 2L))
      .toDF("query_id", "rank", "rel", "total_rel")
    val m = Eval.apAtK(hits, "query_id", "rank", "rel",
        totalRelCol = Some("total_rel"), k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(m.keySet == Set(1L, 2L), s"one output row per input query: $m")
    assert(m(1L) == ((2L, 1.0)), s"q1: ${m(1L)}")
    assert(m(2L) == ((0L, 0.0)), s"q2 (all hits past k): ${m(2L)}")
    // the unnormalized form with a cutoff must keep the query too
    val un = Eval.apAtK(hits.drop("total_rel"), "query_id", "rank", "rel", k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(un(2L) == ((0L, 0.0)), s"unnormalized q2 must survive: ${un(2L)}")
  }

  test("AP@k rejects a negative cutoff") {
    val hits = Seq((1L, 1L, 1)).toDF("query_id", "rank", "rel")
    val e = intercept[IllegalArgumentException] {
      Eval.apAtK(hits, "query_id", "rank", "rel", k = -1)
    }
    assert(e.getMessage.contains("must be >= 0"), e.getMessage)
  }

  test("nDCG is invariant to input partitioning (deterministic fold order)") {
    val hits = Seq((1L, 1L, 1), (1L, 2L, 0), (1L, 3L, 1), (1L, 4L, 1), (1L, 5L, 0))
      .toDF("query_id", "rank", "rel")
    def at(parts: Int) =
      Eval.ndcgAtK(hits.repartition(parts), "query_id", "rank", "rel")
        .select("dcg", "ndcg").first()
    assert(at(1) == at(7), "ndcg must not depend on how rows are partitioned")
  }

  test("eval_ndcg_paths: one row per retrieval path; fusion beats both single paths") {
    val rows = SparkEntry.queries("eval_ndcg_paths")(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rows.keySet == Set("knn", "bm25", "rrf", "hybrid_mmr"))
    rows.values.foreach(v => assert(v >= 0.0 && v <= 1.0, s"ndcg out of [0,1]: $rows"))
    // the quality axis the fusion knobs tune against: RRF of the two
    // single paths should not fall below BOTH of them (it keeps every
    // doc either path ranked highly)
    assert(rows("rrf") >= math.min(rows("knn"), rows("bm25")),
      s"hybrid below both single paths: $rows")
  }
}
