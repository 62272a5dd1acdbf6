package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunker — re-expression of `read_pdf_text`
  * (`Qdrant/main.py:21-56`) as a set-oriented generator: 1 doc-row → N
  * chunk-rows via `posexplode`. No custom UDTF needed.
  *
  * Faithful semantics (SURVEY §2.2):
  *  - P1/P2: split on separator, `trim` each paragraph, drop empties
  *    BEFORE index assignment (`Qdrant/main.py:36`);
  *  - P3: `posexplode` assigns the 0-based `chunk_index`;
  *  - P4: the min-length filter runs AFTER index assignment
  *    (`Qdrant/main.py:40-41`) — dropped short paragraphs leave GAPS in
  *    `chunk_index`, which we preserve;
  *  - P6: `joinParagraphs=false` → the whole document is a single chunk.
  *
  * Scale: the chunker is a narrow transform (no shuffle); at 100 TB it
  * pipelines directly over the parquet scan, with column pruning reading
  * only the id + text columns.
  */
object Chunker {

  /** Chunk `textCol`, carrying `idCols` through.
    * Output columns: idCols..., chunk_index LONG, chunk_text STRING.
    */
  def chunk(
      docs: DataFrame,
      idCols: Seq[String],
      textCol: String = "text",
      separator: String = "\n\n",
      minLen: Int = 50,
      joinParagraphs: Boolean = true): DataFrame = {
    val paras: Column =
      if (joinParagraphs)
        // quote the separator: split() takes a REGEX, but the operator's
        // contract (and the reference's str.split) is a literal string —
        // an unquoted "." or "(" separator would mis-split or throw
        filter(transform(split(col(textCol), java.util.regex.Pattern.quote(separator)),
          trim(_)), p => length(p) > 0)
      else
        filter(array(trim(col(textCol))), p => length(p) > 0)
    docs
      .select(idCols.map(col) :+ posexplode(paras): _*)
      .withColumnRenamed("pos", "chunk_index")
      .withColumnRenamed("col", "chunk_text")
      .filter(length(col("chunk_text")) >= minLen)
      .withColumn("chunk_index", col("chunk_index").cast("long"))
  }

  /** The chunk-dump text line of the reference's side-effect sink
    * (`Qdrant/main.py:48-52`): `[Page {p} | Chunk {c}]\n{text}\n`.
    */
  def dumpLine(page: Column, chunkIndex: Column, text: Column): Column =
    format_string("[Page %s | Chunk %s]\n%s\n", page, chunkIndex, text)

  /** Sliding-window chunking with overlap — the RAG-standard splitter
    * the reference's separator chunker lacks (every production chunker
    * offers `chunk_size` + `chunk_overlap`; overlap keeps sentences
    * that straddle a boundary retrievable from BOTH sides). Windows of
    * `windowTokens` whitespace tokens start every `strideTokens`
    * (stride < window ⇒ overlap); the LAST window may be shorter, and
    * empty windows are dropped — an empty/whitespace-only document
    * yields no rows, and stride > window can never emit phantom rows. Like [[chunk]] this
    * is a narrow generator — tokens materialize in their own projection
    * (HOF lambdas re-evaluate inlined argument subtrees per element),
    * then one `sequence`+`posexplode`; no shuffle, pipelines over the
    * scan at any corpus size.
    * Output: idCols..., `win_index LONG` (0-based), `win_start LONG`
    * (token offset), `n_tokens LONG`, `chunk_text STRING`.
    */
  def slidingChunks(
      docs: DataFrame,
      idCols: Seq[String],
      textCol: String,
      windowTokens: Int,
      strideTokens: Int): DataFrame = {
    require(windowTokens >= 1 && strideTokens >= 1,
      s"need windowTokens ($windowTokens) >= 1 and strideTokens ($strideTokens) >= 1")
    // the ONE shared whitespace tokenizer (mirror of OracleSql.toksSql)
    // — an inline copy here would silently diverge from oracle parity
    // if the shared definition ever changed
    val toks = Dedup.tokens(col(textCol))
    val nWins = when(col("__len") <= windowTokens, lit(1L))
      .otherwise(ceil((col("__len") - lit(windowTokens)).cast("double") / strideTokens)
        .cast("long") + 1L)
    docs
      .select(idCols.map(col) :+ toks.as("__t"): _*)
      .withColumn("__len", size(col("__t")).cast("long"))
      .withColumn("__w", nWins)
      .select(idCols.map(col) :+
        posexplode(transform(sequence(lit(0L), col("__w") - 1),
          i => struct(
            (i * strideTokens).as("start"),
            slice(col("__t"), (i * strideTokens + 1).cast("int"), lit(windowTokens))
              .as("win")))): _*)
      .select(idCols.map(col) ++ Seq(
        col("pos").cast("long").as("win_index"),
        col("col.start").as("win_start"),
        size(col("col.win")).cast("long").as("n_tokens"),
        array_join(col("col.win"), " ").as("chunk_text")): _*)
      .filter(col("n_tokens") > 0)
  }
}
