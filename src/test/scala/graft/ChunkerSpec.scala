package graft

import org.apache.spark.sql.functions._
import graft.ops.Chunker

/** Chunker edge semantics from `Qdrant/main.py:21-56` (SURVEY §2.2). */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, minLen: Int = 5) =
    Chunker
      .chunk(Seq((1L, text)).toDF("doc_id", "text"), Seq("doc_id"), minLen = minLen)
      .select("chunk_index", "chunk_text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq

  test("P4: min-length filter runs AFTER index assignment — gaps remain") {
    // para 0 long, para 1 short (dropped), para 2 long → indexes 0 and 2
    val got = chunksOf("abcdefgh\n\nxy\n\nijklmnop")
    assert(got == Seq((0L, "abcdefgh"), (2L, "ijklmnop")))
  }

  test("P2: empty-after-trim paragraphs dropped BEFORE index assignment") {
    // middle para is whitespace-only → removed pre-enumerate, NO gap
    val got = chunksOf("abcdefgh\n\n   \n\nijklmnop")
    assert(got == Seq((0L, "abcdefgh"), (1L, "ijklmnop")))
  }

  test("P1: paragraphs are trimmed") {
    val got = chunksOf("  abcdefgh  ")
    assert(got == Seq((0L, "abcdefgh")))
  }

  test("P6: joinParagraphs=false keeps whole doc as one chunk") {
    val df = Seq((1L, "abc\n\ndef")).toDF("doc_id", "text")
    val got = Chunker.chunk(df, Seq("doc_id"), minLen = 1, joinParagraphs = false)
      .select("chunk_index", "chunk_text").collect()
    assert(got.length == 1 && got(0).getString(1) == "abc\n\ndef")
  }

  test("S3: dump line format matches the reference sink") {
    val df = Seq((3, 1, "txt")).toDF("page", "chunk_index", "text")
    val line = df.select(Chunker.dumpLine(col("page"), col("chunk_index"), col("text")))
      .first().getString(0)
    assert(line == "[Page 3 | Chunk 1]\ntxt\n")
  }
}
