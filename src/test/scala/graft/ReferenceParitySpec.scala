package graft

import org.apache.spark.sql.functions._
import graft.ops._
import graft.streaming.EventStream

/** End-to-end parity on reference-SHAPED data (FIXTURES.md §A):
  * Thai multi-paragraph documents → chunker with golden dump format →
  * hash-embed → kNN → char-budgeted context → extractive prediction →
  * Recall@5/MRR@5 — the full `Qdrant/main.py` + `llm.py` pipeline shape
  * on a miniature `data_case_100.csv`-like fixture.
  */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  // Mini legal corpus: (page, text) with \n\n paragraphs, some < minLen.
  private val lawPages = Seq(
    (1, "มาตรา 20 ผู้เยาว์ย่อมบรรลุนิติภาวะเมื่อทำการสมรส หากการสมรสนั้นได้ทำตามบทบัญญัติมาตรา 1448 แห่งประมวลกฎหมายนี้\n\nสั้น\n\nมาตรา 21 ผู้เยาว์จะทำนิติกรรมใดๆ ต้องได้รับความยินยอมของผู้แทนโดยชอบธรรมก่อน การใดๆ ที่ผู้เยาว์ได้ทำลงปราศจากความยินยอมเช่นว่านั้นเป็นโมฆียะ"),
    (2, "มาตรา 113 การใดมีวัตถุประสงค์เป็นการต้องห้ามชัดแจ้งโดยกฎหมาย เป็นการพ้นวิสัยหรือเป็นการขัดต่อความสงบเรียบร้อยหรือศีลธรรมอันดีของประชาชน การนั้นเป็นโมฆะ"))

  private val cases = Seq(
    ("ผู้เยาว์ทำสัญญาซื้อขายโดยไม่ได้รับความยินยอม", "20, 21", "1319/2512"))

  test("chunker: paragraph gaps + golden dump format on Thai text") {
    val docs = lawPages.toDF("page", "text")
    val chunks = Chunker.chunk(docs, Seq("page"), minLen = 50)
    val got = chunks.select("page", "chunk_index").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    // page 1: paragraphs 0 and 2 survive (middle "สั้น" < 50 chars → gap)
    assert(got == Set((1, 0L), (1, 2L), (2, 0L)))
    val dump = chunks
      .select(Chunker.dumpLine(col("page"), col("chunk_index"), col("chunk_text")).as("l"))
      .collect().map(_.getString(0))
    assert(dump.forall(l => l.matches("(?s)\\[Page \\d+ \\| Chunk \\d+\\]\\n.*\\n")))
  }

  test("golden-artifact structural parity: 327-page corpus reproduces output.txt invariants") {
    // The committed reference artifact (Qdrant/Documents/Output/output.txt,
    // measured in BASELINE.md) has: 327 chunks, pages 1..327 each exactly
    // once, every chunk_index 0 (PDF page text carries single-\n line
    // breaks, never the \n\n separator), chunk lengths 866..2611 chars.
    // Rebuild a corpus-SHAPED fixture with those data properties and
    // assert the chunker + dump format reproduce every invariant under
    // the reference's own params (separator \n\n, min_len=50, join-mode —
    // Qdrant/main.py:100, writer format main.py:48-52).
    val base = "มาตรา ๑๔๔๘ การสมรสจะทำได้ต่อเมื่อชายและหญิงมีอายุสิบเจ็ดปีบริบูรณ์แล้ว " +
      "แต่ในกรณีที่มีเหตุอันสมควร ศาลอาจอนุญาตให้ทำการสมรสก่อนนั้นได้"
    def pageText(p: Int): String = {
      val target = 870 + (p * 97) % 1731 // trimmed length stays in [866, 2611]
      val sb = new StringBuilder
      var i = 0
      while (sb.length < target) {
        if (i > 0) sb.append(if (i % 3 == 0) " \n" else " ") // PDF-style single-\n lines
        sb.append(base)
        i += 1
      }
      sb.substring(0, target)
    }
    val docs = (1 to 327).map(p => (p, pageText(p))).toDF("page", "text")
    val chunks = Chunker.chunk(docs, Seq("page"), separator = "\n\n", minLen = 50)
    val rows = chunks.select("page", "chunk_index", "chunk_text").collect()
    assert(rows.length == 327, "one chunk per page — 327 total")
    assert(rows.map(_.getInt(0)).toSet == (1 to 327).toSet, "every page exactly once")
    assert(rows.forall(_.getLong(1) == 0L), "single-paragraph pages ⇒ chunk_index 0")
    val lens = rows.map(_.getString(2).length)
    assert(lens.forall(l => l >= 866 && l <= 2611),
      s"chunk lengths within the artifact's 866..2611, got ${lens.min}..${lens.max}")
    val dump = chunks
      .select(Chunker.dumpLine(col("page"), col("chunk_index"), col("chunk_text")).as("l"))
      .collect().map(_.getString(0))
    assert(dump.forall(_.matches("(?s)\\[Page \\d+ \\| Chunk 0\\]\\n.*\\n")),
      "writer format [Page p | Chunk c]\\n{text}\\n")
    val hdr = "\\[Page (\\d+) \\| Chunk (\\d+)\\]".r
    val pages = dump.map(l => hdr.findFirstMatchIn(l).get.group(1).toInt)
    assert(pages.sorted.toSeq == (1 to 327), "headers parse back to pages 1..327")
  }

  test("full RAG pipeline on reference-shaped fixture: retrieve → context → predict → eval") {
    val docs = lawPages.toDF("page", "text")
    val chunks = Chunker.chunk(docs, Seq("page"), minLen = 50)
      .withColumn("chunk_id", col("page") * 100 + col("chunk_index"))
    val points = VectorOps.embedTextDistributed(chunks, Seq("chunk_id"), "chunk_text", 32)
      .join(chunks, "chunk_id")
    val queries = cases.toDF("text", "answers", "คำพิพากษาศาลฎีกาที่")
      .withColumn("query_id", lit(0L))
    val qv = VectorOps.embedTextDistributed(queries, Seq("query_id"), "text", 32)
    val hits = Knn.knnJoin(qv, points, "query_id", "embedding", "chunk_id", "embedding", 2,
      metric = "dot")
    assert(hits.count() == 2)
    val ctx = ContextAssembly.budgetedContext(
      hits, "query_id", "rank", "chunk_text", col("page"), col("chunk_index"), 150)
    val row = ctx.first()
    assert(row.getAs[Long]("context_text_chars") <= 150)
    assert(row.getAs[String]("context").startsWith("[Page "))
    // L2 stand-in: predicted numbers = digit runs of the context
    val pred = ctx.withColumn("predicted", concat_ws(" ",
      expr("regexp_extract_all(context, '[0-9]+', 0)")))
    val evalRow = Eval.withMetrics(
      pred.join(queries.select("query_id", "answers"), "query_id"),
      "answers", "predicted", 5).first()
    val recall = evalRow.getAs[Double]("recall_at_k")
    val mrr = evalRow.getAs[Double]("mrr_at_k")
    assert(recall >= 0.0 && recall <= 1.0 && mrr >= 0.0 && mrr <= 1.0)
    // the retrieved มาตรา 20/21 page should give nonzero recall
    assert(recall > 0.0)
  }

  test("stateful streaming sessionization equals batch session counts") {
    val tmp = java.nio.file.Files.createTempDirectory("evsess").toString
    Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(tmp)
    val streamed = EventStream.runSessionsOnce(spark, tmp, "sess_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = Relational.sessionize(spark, sf0001)
      .groupBy("user_id").agg(max("session_id").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1) + 1)).toMap
    // batch session_id starts at 0 (first row's flag is 0) → +1 = count
    assert(streamed == batch)
  }
}
