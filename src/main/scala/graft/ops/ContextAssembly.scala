package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAG context assembly — `qdrant_retrieve_context`
  * (`Qdrant/llm.py:16-34`): a greedy char-budgeted fold over score-ordered
  * hits, re-expressed as a cumulative-sum window + boundary `substring` +
  * ordered string aggregation. Pure built-ins, one shuffle (the group-by).
  *
  * Exact reference semantics (SURVEY §2.4, §7.4):
  *  - R1: `trim` the hit text, drop empties BEFORE budgeting
  *    (`Qdrant/llm.py:24-26`) — empty hits consume no budget;
  *  - R2: the budget counts TEXT chars only (headers are free,
  *    `Qdrant/llm.py:27`); a hit is kept iff the running total of
  *    previous kept hits is `< budget`; the boundary hit is truncated to
  *    the remaining budget (`t[:max(0, budget-total)]`,
  *    `Qdrant/llm.py:28`);
  *  - R3: header `[Page {p} | Chunk {c}]\n{text}` with `'?'` defaults for
  *    missing metadata (`Qdrant/llm.py:30`);
  *  - R4: parts joined with `"\n\n---\n\n"` (`Qdrant/llm.py:34`), in rank
  *    order, made shuffle-deterministic via `array_sort` over
  *    `(rank, part)` structs rather than relying on `collect_list` order.
  */
object ContextAssembly {

  val Separator = "\n\n---\n\n"

  /** Input: hit rows `(queryIdCol, rankCol, textCol, pageCol, chunkCol)`
    * with rank 1..k per query. Output: one row per query:
    * `(query_id, context STRING, context_text_chars LONG)` where
    * `context_text_chars` is the budget actually consumed (≤ maxCtxChars).
    */
  def budgetedContext(
      hits: DataFrame,
      queryIdCol: String,
      rankCol: String,
      textCol: String,
      pageCol: Column,
      chunkCol: Column,
      maxCtxChars: Int): DataFrame = {
    val t = trim(coalesce(col(textCol), lit("")))
    val cleaned = hits
      .withColumn("__t", t)
      .filter(length(col("__t")) > 0) // R1: empties skipped pre-budget
    val w = Window
      .partitionBy(col(queryIdCol))
      .orderBy(col(rankCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prev = coalesce(sum(length(col("__t"))).over(w), lit(0L))
    val remaining = lit(maxCtxChars.toLong) - prev
    val kept = cleaned
      .withColumn("__prev", prev)
      .filter(col("__prev") < maxCtxChars) // R2: strict — prev==budget drops
      .withColumn("__txt", substring_index_safe(col("__t"), remaining))
      .withColumn(
        "__part",
        format_string(
          "[Page %s | Chunk %s]\n%s",
          coalesce(pageCol.cast("string"), lit("?")),
          coalesce(chunkCol.cast("string"), lit("?")),
          col("__txt"))) // R3
    kept
      .groupBy(col(queryIdCol).as("query_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col(rankCol).cast("long").as("r"), col("__part").as("p")))),
            s => s.getField("p")),
          Separator).as("context"), // R4: deterministic rank order
        sum(least(length(col("__t")).cast("long"), lit(maxCtxChars.toLong) - col("__prev")))
          .as("context_text_chars"))
  }

  /** `t[:remaining]` with the reference's `max(0, …)` clamp
    * (`Qdrant/llm.py:28`); dynamic length via `Column.substr`.
    */
  private def substring_index_safe(t: Column, remaining: Column): Column =
    t.substr(lit(1), greatest(least(remaining, length(t).cast("long")), lit(0L)).cast("int"))

  /** L1 prompt projection (`Qdrant/llm.py:103-114`): empty context gets the
    * reference's Thai fallback literal.
    */
  def prompt(context: Column, question: Column, instruction: String): Column =
    format_string(
      "%s\n\nบริบท:\n%s\n\nคำถาม: %s",
      lit(instruction),
      when(length(coalesce(context, lit(""))) === 0, lit("(ไม่พบบริบท)")).otherwise(context),
      question)
}
