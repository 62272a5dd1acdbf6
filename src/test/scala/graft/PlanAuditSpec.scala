package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Global scale-discipline audit: walk the PHYSICAL plan of EVERY
  * registered batch query and reject the two silent scale-killers —
  * an unpartitioned window (all rows through one reducer) and a
  * cartesian product (candidate generation that never got a key).
  * Individual PlanSpec pins guard flagship shapes; this net catches
  * the query nobody pinned.
  *
  * `stream_*` queries are excluded (their registry functions RUN a
  * streaming job at construction). `dedup_jaccard` is the documented
  * exception: its quadratic baseline is execution-guarded by
  * `raise_error` above maxDocs (GuardrailSpec) and is id-bounded in
  * the registry — the audit asserts the exception list STAYS this
  * short rather than exempting silently.
  */
class PlanAuditSpec extends SparkSpec {

  // the guarded quadratic baseline: broadcast nested loop by design,
  // bounded by doc_id < 100 + a lazy raise_error above maxDocs
  private val cartesianExempt = Set("dedup_jaccard")

  private def offenders(plan: SparkPlan): (Seq[String], Seq[String]) = {
    val unpartWindows = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName
    }
    val cartesians = plan.collect { case c: CartesianProductExec => c.nodeName }
    (unpartWindows, cartesians)
  }

  test("no batch query plans an unpartitioned window or a cartesian product") {
    val batchQueries = SparkEntry.queries.keys.filterNot(_.startsWith("stream_")).toSeq.sorted
    val bad = batchQueries.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sf0001).queryExecution.sparkPlan
      val (windows, cartesians) = offenders(plan)
      val winMsg =
        if (windows.nonEmpty) Seq(s"$name: unpartitioned window (${windows.mkString(",")})")
        else Nil
      val cartMsg =
        if (cartesians.nonEmpty && !cartesianExempt.contains(name))
          Seq(s"$name: cartesian product")
        else Nil
      winMsg ++ cartMsg
    }
    assert(bad.isEmpty, s"scale-killer plans:\n${bad.mkString("\n")}")
    assert(batchQueries.size >= 100, s"audit walked only ${batchQueries.size} queries")
  }
}
