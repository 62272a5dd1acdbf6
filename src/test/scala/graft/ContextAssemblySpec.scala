package graft

import org.apache.spark.sql.functions._
import graft.ops.ContextAssembly

/** Char-budget boundary semantics from `Qdrant/llm.py:16-34` — the three
  * boundary cases of FIXTURES.md §A4.
  */
class ContextAssemblySpec extends SparkSpec {
  import spark.implicits._

  // hits: (query_id, rank, text, page, chunk)
  private def assemble(maxChars: Int, rows: (Long, Int, String)*) = {
    val df = rows.toDF("q", "rank", "text")
      .withColumn("page", col("rank"))
      .withColumn("chunk", col("rank"))
    ContextAssembly
      .budgetedContext(df, "q", "rank", "text", col("page"), col("chunk"), maxChars)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[String]("context"), r.getAs[Long]("context_text_chars")))
      .head
  }

  test("R2a: all hits fit exactly — no truncation") {
    val (_, ctx, used) = assemble(8, (1L, 1, "abcd"), (1L, 2, "efgh"))
    assert(ctx == "[Page 1 | Chunk 1]\nabcd\n\n---\n\n[Page 2 | Chunk 2]\nefgh")
    assert(used == 8L)
  }

  test("R2b: boundary hit truncated mid-string; later hits dropped") {
    val (_, ctx, used) = assemble(6, (1L, 1, "abcd"), (1L, 2, "efgh"), (1L, 3, "zz"))
    assert(ctx == "[Page 1 | Chunk 1]\nabcd\n\n---\n\n[Page 2 | Chunk 2]\nef")
    assert(used == 6L)
  }

  test("R2c: first hit alone exceeds budget — clamp, single truncated part") {
    val (_, ctx, used) = assemble(3, (1L, 1, "abcdefgh"))
    assert(ctx == "[Page 1 | Chunk 1]\nabc")
    assert(used == 3L)
  }

  test("R2: prev==budget exactly — subsequent hit fully dropped") {
    val (_, ctx, used) = assemble(4, (1L, 1, "abcd"), (1L, 2, "efgh"))
    assert(ctx == "[Page 1 | Chunk 1]\nabcd")
    assert(used == 4L)
  }

  test("R1: empty/whitespace hits consume no budget and emit no part") {
    val (_, ctx, used) = assemble(8, (1L, 1, "   "), (1L, 2, "abcd"))
    assert(ctx == "[Page 2 | Chunk 2]\nabcd")
    assert(used == 4L)
  }

  test("R3: missing page/chunk metadata renders '?'") {
    val df = Seq((1L, 1, "abcd")).toDF("q", "rank", "text")
      .withColumn("page", lit(null).cast("int"))
      .withColumn("chunk", lit(null).cast("int"))
    val ctx = ContextAssembly
      .budgetedContext(df, "q", "rank", "text", col("page"), col("chunk"), 10)
      .first().getAs[String]("context")
    assert(ctx == "[Page ? | Chunk ?]\nabcd")
  }

  test("L1: empty context falls back to the Thai placeholder") {
    val df = Seq((1L, "", "คำถาม")).toDF("id", "ctx", "q")
    val p = df.select(ContextAssembly.prompt(col("ctx"), col("q"), "SYS")).first().getString(0)
    assert(p.contains("(ไม่พบบริบท)") && p.startsWith("SYS"))
  }
}
