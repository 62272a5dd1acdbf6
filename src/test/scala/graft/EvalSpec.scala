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
}
