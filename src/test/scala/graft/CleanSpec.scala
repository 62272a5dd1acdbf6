package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Corpus cleaning: boilerplate-segment removal and PII redaction, plus
  * the Gopher-style composite quality filter.
  */
class CleanSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = "all rights reserved"

  test("removeBoilerplate drops repeated segments, preserves order, keeps empty docs") {
    val docs = Seq(
      (1L, s"alpha one | $boiler | beta two"),
      (2L, s"$boiler | gamma three"),
      (3L, s"delta four | $boiler"),
      (4L, boiler), // fully boilerplate → empty clean_text, still present
      (5L, "unique only")
    ).toDF("doc_id", "text")
    val out = Clean.removeBoilerplate(docs, "doc_id", "text", sep = " | ", minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.length == 5)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(3) == "alpha one | beta two")
    assert(byId(1L).getLong(1) == 3 && byId(1L).getLong(2) == 2)
    assert(byId(2L).getString(3) == "gamma three")
    assert(byId(3L).getString(3) == "delta four")
    assert(byId(4L).getString(3) == "" && byId(4L).getLong(2) == 0)
    assert(byId(5L).getString(3) == "unique only")
  }

  test("boilerplate doc frequency is DISTINCT docs — in-doc repeats don't qualify") {
    // 'spam' appears 3 times but only in ONE doc → not boilerplate
    val docs = Seq(
      (1L, "spam | spam | spam"),
      (2L, "other | text")
    ).toDF("doc_id", "text")
    val b = Clean.boilerplateSegments(docs, "doc_id", "text", " | ", minDocs = 2).collect()
    assert(b.isEmpty)
    val out = Clean.removeBoilerplate(docs, "doc_id", "text", " | ", minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getString(3) == "spam | spam | spam")
  }

  test("boilerplate matching is case-insensitive on the key, output keeps original case") {
    val docs = Seq(
      (1L, "Header Bar | body a"),
      (2L, "header bar | body b"),
      (3L, "HEADER BAR | body c")
    ).toDF("doc_id", "text")
    val out = Clean.removeBoilerplate(docs, "doc_id", "text", " | ", minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(3)).toSeq == Seq("body a", "body b", "body c"))
  }

  test("redactPii replaces every kind and counts against the original text") {
    val df = Seq((1L,
      "mail me@host.org or http://u:p@site.com/x then ping 10.1.2.3 call +1-555-0100-22"))
      .toDF("id", "text")
    val r = Clean.redactPii(df, "text").collect()(0)
    val red = r.getAs[String]("redacted")
    assert(red == "mail <EMAIL> or <URL> then ping <IP> call <PHONE>")
    // counts are over the ORIGINAL text: the URL's userinfo part also
    // matches the email pattern, so n_email = 2 even though the URL
    // pass already consumed it in the redacted output
    assert(r.getAs[Long]("n_url") == 1)
    assert(r.getAs[Long]("n_email") == 2)
    assert(r.getAs[Long]("n_ip") == 1)
    assert(r.getAs[Long]("n_phone") == 1)
  }

  test("redactPii is a no-op on clean text and idempotent on redacted text") {
    val clean = "just plain words with no contact info at all"
    val df = Seq((1L, clean)).toDF("id", "text")
    val once = Clean.redactPii(df, "text").collect()(0)
    assert(once.getAs[String]("redacted") == clean)
    assert(once.getAs[Long]("n_url") == 0 && once.getAs[Long]("n_email") == 0 &&
      once.getAs[Long]("n_ip") == 0 && once.getAs[Long]("n_phone") == 0)
    val redactedOnce = Seq((1L,
      "mail <EMAIL> or <URL> then ping <IP> call <PHONE>")).toDF("id", "text")
    val twice = Clean.redactPii(redactedOnce, "text").collect()(0)
    assert(twice.getAs[String]("redacted") == redactedOnce.collect()(0).getString(1))
  }

  test("qualityFilter: first failing rule wins; clean doc keeps") {
    val short = "a b c" // 3 tokens → too_short
    val repetitive = ("the spam " * 20).trim // top unigram 50% → repetitive_unigram
    val ok = "the quick brown fox jumps over a lazy dog and then walks away home again"
    val docs = Seq((1L, short), (2L, repetitive), (3L, ok)).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFilter(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("reason") == "too_short" && !out(0).getAs[Boolean]("keep"))
    assert(out(1).getAs[String]("reason") == "repetitive_unigram")
    assert(out(2).getAs[String]("reason") == "ok" && out(2).getAs[Boolean]("keep"))
  }

  test("qualityFilter: low-diversity doc with enough tokens is flagged low_diversity") {
    // 12 distinct-enough tokens is the gate; build a doc that passes the
    // earlier rules (length, stopwords, unigram frac) but has TTR < 0.3:
    // 40 tokens drawn evenly from 10 types (each 4/40 = 0.1 ≤ 0.125)
    val words = (1 to 10).flatMap(i => Seq.fill(4)(s"w$i"))
    // inject enough stopwords by making two of the types stopwords
    val text = (words.take(32) ++ Seq("the", "a", "the", "a", "the", "a", "the", "a"))
      .mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFilter(docs, "doc_id", "text").collect()(0)
    assert(out.getAs[String]("reason") == "low_diversity")
  }


  test("sourceCards: duplicates counted within source; empty-token source keeps its rows") {
    // The gate corpus has zero exact duplicates, so dup_doc_frac is
    // only vacuously oracle-checked there — pin it on a constructed
    // frame. Source A: 4 docs, 2 identical => dup 0.25. Source B: 2
    // distinct docs => 0.0. Source C: one whitespace-only doc — the
    // vocab LEFT join must keep its six rows (vocab 0, totals 0,
    // NULL quality: no doc reached the cascade).
    val long = "the quick brown fox jumps over the lazy dog again and again " * 2
    val docs = Seq(
      (1L, "A", long + "one"), (2L, "A", long + "one"),
      (3L, "A", long + "three"), (4L, "A", long + "four"),
      (5L, "B", long + "five"), (6L, "B", long + "six"),
      (7L, "C", "   ")).toDF("doc_id", "source", "text")
    val rows = graft.ops.TextAnalysis.sourceCards(docs, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(rows.size == 18, s"expected 3 sources x 6 metrics: ${rows.size}")
    assert(rows(("A", "dup_doc_frac")) == Some(0.25), s"A dup: ${rows(("A", "dup_doc_frac"))}")
    assert(rows(("B", "dup_doc_frac")) == Some(0.0))
    assert(rows(("A", "n_docs")) == Some(4.0) && rows(("B", "n_docs")) == Some(2.0))
    assert(rows(("C", "n_docs")) == Some(1.0), "empty-token source must keep its rows")
    assert(rows(("C", "vocab_size")) == Some(0.0) && rows(("C", "total_ws_tokens")) == Some(0.0))
    assert(rows(("C", "quality_ok_frac")) == None, "no C doc reached the cascade")
  }


  test("data card stays readable on an empty corpus (no ANSI divide-by-zero)") {
    import org.apache.spark.sql.types._
    val emptyProfiles = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("doc_id", LongType), StructField("n_tokens", LongType),
        StructField("content_hash", StringType), StructField("reason", StringType),
        StructField("keep", BooleanType))))
    val emptyVocab = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("term", StringType))))
    val rows = graft.ops.TextAnalysis.dataCardFromProfiles(emptyProfiles, emptyVocab)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows.size == 6, s"card must keep its six rows: $rows")
    assert(rows("n_docs") == Some(0.0) && rows("vocab_size") == Some(0.0))
    assert(rows("dup_doc_frac") == None, "dup fraction is undefined on zero docs")
  }
}
