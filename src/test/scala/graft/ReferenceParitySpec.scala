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
