package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-cleaning operators (north-star extension): line/segment-level
  * boilerplate removal (the C4/CCNet move — drop text fragments repeated
  * across many documents: nav bars, license headers, cookie banners) and
  * PII redaction (emails / URLs / IPs / phone numbers → typed tags).
  *
  * Scale design: boilerplate detection is ONE doc-frequency aggregation
  * over (segment-key) — the boilerplate table is bounded by
  * Σsegments / minDocs (each boilerplate segment needs ≥ minDocs
  * supporting docs), so at production `minDocs` it broadcasts and the
  * removal join is map-side. Redaction is a narrow projection (chained
  * `regexp_replace`, codegen'd) — zero shuffle at any scale.
  */
object Clean {

  /** Segment rows: split `textCol` on the LITERAL `sep`, trim, drop
    * empties BEFORE index assignment (same discipline as
    * [[Chunker.chunk]] — indexes are dense over surviving segments).
    * Output: (doc_id, idx LONG, seg STRING).
    */
  def segments(docs: DataFrame, idCol: String, textCol: String, sep: String): DataFrame = {
    val parts = filter(
      transform(split(col(textCol), java.util.regex.Pattern.quote(sep)), trim(_)),
      p => length(p) > 0)
    docs
      .select(col(idCol).as("doc_id"), posexplode(parts))
      .select(col("doc_id"), col("pos").cast("long").as("idx"), col("col").as("seg"))
  }

  /** Boilerplate segment table: normalized segments appearing in at
    * least `minDocs` DISTINCT documents, with their doc frequency —
    * the diagnostic to run before [[removeBoilerplate]] (same pattern
    * as [[Dedup.hotBuckets]]). One distinct + one group-by on the
    * segment key; result size ≤ Σsegments / minDocs by construction.
    */
  def boilerplateSegments(docs: DataFrame, idCol: String, textCol: String,
      sep: String, minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs ($minDocs) must be >= 2 — a segment in one doc is content")
    segments(docs, idCol, textCol, sep)
      .select(col("doc_id"), lower(col("seg")).as("key"))
      .distinct()
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Remove boilerplate segments and re-assemble each document from its
    * surviving segments in original order. Output per INPUT doc (docs
    * whose every segment is boilerplate stay, with empty `clean_text` —
    * dropping them is the caller's policy decision):
    * (doc_id, n_segs, n_kept, clean_text).
    *
    * Plan shape: segment explode (narrow) → boilerplate doc-frequency
    * aggregate (shuffle on segment key) → membership join back (the
    * boilerplate side is the SMALL side — broadcast at production
    * minDocs) → one per-doc aggregation (shuffle on doc_id) with
    * order-restoring `array_sort(collect_list(struct(idx, seg)))`, the
    * same shuffle-deterministic re-assembly as R4 context building.
    */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      sep: String, minDocs: Int): DataFrame = {
    val segs = segments(docs, idCol, textCol, sep)
      .withColumn("key", lower(col("seg")))
    val boiler = boilerplateSegments(docs, idCol, textCol, sep, minDocs)
      .select(col("key"), lit(1).as("__b"))
    // left join + null-flag instead of left_anti: keeps removed rows in
    // the stream so n_segs / n_kept come out of ONE per-doc aggregation
    // (collect_list skips the nulled-out boilerplate structs)
    val rebuilt = segs.join(boiler, Seq("key"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segs"),
        count(when(col("__b").isNull, 1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("__b").isNull, struct(col("idx"), col("seg"))))),
            s => s.getField("seg")),
          sep).as("clean_text"))
    docs.select(col(idCol).as("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_segs"), lit(0L)).as("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** PII patterns, applied IN ORDER (URL first — a URL may embed an
    * email-shaped userinfo part; an email-first pass would corrupt it).
    * Every pattern is in the RE2-compatible subset (no backreferences,
    * no lookaround) so Spark's Java regex and DuckDB's RE2 agree.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("url", "https?://[^\\s]+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\+?[0-9][0-9\\-]{6,}[0-9]", "<PHONE>"))

  /** Redact PII in `textCol` → `outCol`, with a per-kind match count
    * column (`n_url`, `n_email`, `n_ip`, `n_phone` — counted against the
    * ORIGINAL text, before any replacement). Narrow projection; the
    * regex chain runs inside whole-stage codegen.
    */
  def redactPii(df: DataFrame, textCol: String, outCol: String = "redacted"): DataFrame = {
    val counts = piiPatterns.map { case (name, pat, _) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long").as(s"n_$name")
    }
    val redacted = piiPatterns.foldLeft(col(textCol)) { case (c, (_, pat, tag)) =>
      regexp_replace(c, pat, tag)
    }
    df.select(df.columns.map(col) ++ counts :+ redacted.as(outCol): _*)
  }
}
