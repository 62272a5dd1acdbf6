package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Robustness sweep: EVERY registry query — batch and streaming —
  * over a degenerate corpus the synthetic sfDirs never contain.
  * Documents: NULL / empty / whitespace-only / single-char / huge /
  * single-token text, exotic Unicode (Thai, CJK, emoji+ZWJ, combining
  * marks, RTL, BOM, control chars, non-ASCII spaces), NULL lang.
  * Embeddings: zero / denormal / huge / NULL / duplicate vectors.
  * Events: NULL timestamps/users/values, malformed/nested/overflowing
  * JSON props, epoch and far-future instants. Warehouse
  * (orders/lineitem): NULL foreign keys, NULL/negative/huge measures,
  * NULL status strings. The DuckDB oracle gate proves engine≡oracle
  * on well-formed data; this sweep proves the engine side doesn't
  * crash or emit NaN/Inf when a real crawl's garbage reaches it.
  * In-contract adversarial only: ids stay unique and embedding
  * ELEMENTS stay non-null (the documented ingest contract); whole-row
  * NULL embeddings and NULL text are in contract — a failed embed job
  * or empty fetch is normal crawl debris.
  *
  * Two invariants per query: (1) it executes to completion; (2) no
  * NaN/Infinity anywhere in the collected output (the repo-wide
  * "NULL, never NaN/Inf" degenerate-value discipline, here enforced
  * registry-wide instead of per-operator).
  */
class AdversarialCorpusSpec extends SparkSpec {

  /** Run every registry query whose name passes `keep`; collect ALL
    * failures (abort or non-finite output) so one broken query never
    * hides the others.
    */
  private def sweep(keep: String => Boolean, what: String): Unit = {
    val dir = AdversarialCorpusSpec.corpusDir(spark, sf0001)
    val qs = SparkEntry.queries.filter { case (k, _) => keep(k) }
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val rows = fn(spark, dir).collect()
        val bad = rows.iterator.flatMap(AdversarialCorpusSpec.nonFinite).take(1).toList
        if (bad.nonEmpty) failures += s"$name: non-finite output value ${bad.head}"
      } catch {
        case e: Throwable =>
          failures += s"$name: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(2).mkString(" | ").take(300)
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} of ${qs.size} $what broke on the adversarial corpus:\n  " +
        failures.mkString("\n  "))
  }

  test("every batch query completes on the adversarial corpus with finite output") {
    sweep(!_.startsWith("stream_"), "batch queries")
  }

  test("every streaming query completes on the adversarial corpus with finite output") {
    // Streams are the garbage-heavy case by construction (a crawl's
    // micro-batches arrive unfiltered). The doc-backed streaming
    // operators (nb_score/nb_oov/quality/data_card/dedup/novel/index/
    // search/delete) see the adversarial documents; the events-backed
    // ones (hourly/sessionize/join/cms/drift) see the adversarial
    // events debris — NULL timestamps and keys included.
    sweep(_.startsWith("stream_"), "streaming queries")
  }
}

object AdversarialCorpusSpec {

  /** Walk any collected value (rows, arrays, maps nest) for NaN/Inf. */
  def nonFinite(v: Any): Iterator[String] = v match {
    case null => Iterator.empty
    case d: java.lang.Double =>
      if (d.isNaN || d.isInfinite) Iterator(d.toString) else Iterator.empty
    case f: java.lang.Float =>
      if (f.isNaN || f.isInfinite) Iterator(f.toString) else Iterator.empty
    case r: Row => r.toSeq.iterator.flatMap(nonFinite)
    case s: scala.collection.Seq[_] => s.iterator.flatMap(nonFinite)
    case m: scala.collection.Map[_, _] => m.valuesIterator.flatMap(nonFinite)
    case _ => Iterator.empty
  }

  /** Build (once per JVM) a temp sfDir: sf0.001's small dimension
    * tables copied verbatim; documents, embeddings, events, orders,
    * and lineitem replaced by the adversarial versions below with
    * byte-identical schemas. Deleted on JVM exit (the
    * SparkEntryStream staged-dir discipline).
    */
  private val memo = new java.util.concurrent.atomic.AtomicReference[String]()
  def corpusDir(spark: SparkSession, baseSf: String): String = synchronized {
    Option(memo.get()).getOrElse {
      val dir = java.nio.file.Files.createTempDirectory("graft-adv").toString
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(): Unit
        }
        rm(new java.io.File(dir))
      }
      val replaced = Set("documents.parquet", "embeddings.parquet",
        "events.parquet", "orders.parquet", "lineitem.parquet")
      val base = new java.io.File(baseSf)
      base.listFiles().foreach { f =>
        if (!replaced.contains(f.getName))
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(dir, f.getName))
      }
      writeDocuments(spark, s"$dir/documents.parquet")
      writeEmbeddings(spark, s"$dir/embeddings.parquet")
      writeEvents(spark, baseSf, s"$dir/events.parquet")
      writeWarehouse(spark, baseSf, dir)
      memo.set(dir)
      dir
    }
  }

  // ---- adversarial events: the sf0.001 stream plus debris -------------
  // NULL timestamps (the classic watermark production failure), NULL
  // user/type/value keys, malformed / overflowing / nested JSON props,
  // epoch and far-future timestamps, duplicate-instant bursts, and
  // huge-but-finite values. Magnitude contract for measures: 1e12 —
  // large enough to dominate any aggregate, small enough that adding a
  // unit-scale value is still EXACT in a double (≪ 2^52 dynamic
  // range). 1e308 would overflow any engine's sum to Inf, and ±1e100
  // makes ANY parallel double sum ORDER-DEPENDENT (catastrophic
  // cancellation decides which small terms survive, and partitioning
  // decides the order — measured: q_salted_agg returned 283.94 vs
  // 1571.36 for the same key at 4 vs 7 shuffle partitions, and a plain
  // groupBy is equally exposed; that is IEEE-754 physics, not an
  // engine flaw — unbounded-magnitude inputs need decimal/Kahan
  // accumulation, which no analytics engine defaults to). Both are
  // therefore out of the ingest contract.
  // event_ids stay unique (the documented ingest contract).
  private def writeEvents(spark: SparkSession, baseSf: String, path: String): Unit = {
    val baseEvents = ops.Tables.events(spark, baseSf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
    val sharedInstant = ts("2024-01-02 03:04:05")
    val nasty: Seq[Row] = Seq(
      Row(10000L, null, 13L, "error", 1.0, "{\"k\": 1}"),          // NULL ts
      Row(10001L, ts("1970-01-01 00:00:00"), 13L, "signup", 2.0, "{\"k\": 2}"), // epoch
      Row(10002L, ts("2100-01-01 00:00:00"), 12L, "purchase", 3.0, "{\"k\": 3}"), // far future
      Row(10003L, sharedInstant, null, "click", 4.0, "{\"k\": 4}"), // NULL user
      Row(10004L, sharedInstant, 12L, null, 5.0, "{\"k\": 5}"),     // NULL type
      Row(10005L, sharedInstant, 12L, "click", null, "{\"k\": 6}"), // NULL value
      Row(10006L, sharedInstant, 12L, "click", 1e12, "{\"k\": 7}"), // huge value
      Row(10007L, sharedInstant, 12L, "click", -1e12, "{\"k\": 8}"),
      Row(10008L, sharedInstant, 12L, "click", 9.0, null),          // NULL props
      Row(10009L, sharedInstant, 12L, "click", 10.0, ""),           // empty props
      Row(10010L, sharedInstant, 12L, "click", 11.0, "not json"),   // malformed
      Row(10011L, sharedInstant, 12L, "click", 12.0, "{\"k\": null}"),
      Row(10012L, sharedInstant, 12L, "click", 13.0, "{\"k\": {\"a\": 1}}"), // nested
      Row(10013L, sharedInstant, 12L, "click", 14.0, "{\"k\": 99999999999999999999}"), // overflow
      Row(10014L, sharedInstant, 12L, "weird\ttype\n", 15.0, "{\"k\": 9}"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    baseEvents.unionByName(spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(nasty).asJava),
        schema))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  // ---- adversarial warehouse: orders/lineitem plus debris -------------
  // NULL foreign keys (an order no customer claims; a line item whose
  // order/part/supplier is unknown), NULL/negative/huge-but-finite
  // measures, NULL status/flag strings, epoch and far-future dates —
  // the referential rot a real warehouse accumulates. Primary keys
  // (o_orderkey; (l_orderkey, l_linenumber)) stay unique and non-null.
  private def writeWarehouse(spark: SparkSession, baseSf: String, dir: String): Unit = {
    def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
    val ordersSchema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType)))
    val nastyOrders: Seq[Row] = Seq(
      Row(900001L, null, "O", 100.0, ts("2024-03-01 00:00:00"), "1-URGENT"),   // orphan order
      Row(900002L, 7L, null, 200.0, ts("2024-03-02 00:00:00"), "2-HIGH"),      // NULL status
      Row(900003L, 7L, "O", null, ts("2024-03-03 00:00:00"), "3-MEDIUM"),      // NULL price
      Row(900004L, 7L, "O", -500.0, ts("2024-03-04 00:00:00"), "4-NOT SPECIFIED"), // refund
      Row(900005L, 7L, "O", 1e12, ts("2024-03-05 00:00:00"), "5-LOW"),        // huge price
      Row(900006L, 7L, "O", 300.0, null, "1-URGENT"),                          // NULL date
      Row(900007L, 7L, "O", 400.0, ts("1970-01-01 00:00:00"), null),           // epoch + NULL prio
      Row(900008L, 999999L, "O", 500.0, ts("2100-01-01 00:00:00"), "2-HIGH"))  // dangling FK, far future
    val lineitemSchema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType)))
    val nastyLines: Seq[Row] = Seq(
      Row(900001L, null, null, 1, 1.0, 10.0, 0.1, 0.02, "N", "O", ts("2024-03-01 00:00:00")), // NULL part/supp
      Row(900001L, 5L, 5L, 2, null, 20.0, 0.1, 0.02, "N", "O", ts("2024-03-01 00:00:00")),    // NULL qty
      Row(900002L, 5L, 5L, 1, -3.0, 30.0, 0.1, 0.02, "R", "F", ts("2024-03-02 00:00:00")),    // return qty
      Row(900003L, 5L, 5L, 1, 2.0, null, null, null, null, null, null),                       // NULL everything
      Row(900004L, 5L, 5L, 1, 2.0, 1e12, 0.5, 0.5, "A", "F", ts("1970-01-01 00:00:00")),     // huge price, epoch
      Row(900005L, 5L, 5L, 1, 2.0, 40.0, 1.5, -0.1, "N", "O", ts("2100-01-01 00:00:00")))     // out-of-range rates
    def augment(table: String, schema: StructType, nasty: Seq[Row]): Unit =
      spark.read.parquet(s"$baseSf/$table.parquet")
        // cast to the target schema first: the generator's timestamp
        // flavor (NTZ vs UTC) must not make the union ambiguous
        .select(schema.fields.toIndexedSeq.map(f => col(f.name).cast(f.dataType)): _*)
        .unionByName(spark.createDataFrame(
          new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(nasty).asJava),
          schema))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$table.parquet")
    augment("orders", ordersSchema, nastyOrders)
    augment("lineitem", lineitemSchema, nastyLines)
  }

  // ---- adversarial documents: 500 rows, ids 0..499 --------------------
  // 0..469 well-formed (seeded vocab mixture: the model-shaped ops —
  // NB, BPE, DSIR, LSH — need enough signal to train); 470..489 the
  // degenerate rows; 490..499 tiny-but-valid stubs.
  private def writeDocuments(spark: SparkSession, path: String): Unit = {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "engine", "corpus",
      "query", "vector", "token", "shard", "merge", "index", "batch", "court",
      "case", "filing", "motion", "appeal", "clause", "statute", "the", "of",
      "and", "to", "in", "a", "is", "for", "with", "on")
    val langs = Vector("en", "fr", "de", "es", "zh")
    def normalText(id: Int): String = {
      val n = 30 + rnd.nextInt(50)
      val words = (0 until n).map { i =>
        val w = vocab(rnd.nextInt(vocab.size))
        val tail = if (rnd.nextInt(12) == 0) s" ${1000 + rnd.nextInt(9000)}" else ""
        val break = if (i > 0 && i % 20 == 0) "\n\n" else ""
        s"$break$w$tail"
      }
      words.mkString(" ")
    }
    val normal = (0 until 470).map { id =>
      // exact-dup pair (410,411) and a near-dup pair (400,401) so the
      // dedup family has hits among the well-formed rows
      val text =
        if (id == 411) null // placeholder, patched below
        else normalText(id)
      (id.toLong, text, langs(id % 5), s"src${id % 20}")
    }.toArray
    normal(411) = (411L, normal(410)._2, normal(410)._3, normal(410)._4)
    normal(401) = (401L, normal(400)._2.replaceFirst("\\w+", "changed"),
      normal(400)._3, normal(400)._4)
    val nasty: Seq[(Long, String, String, String)] = Seq(
      (470L, null, "en", "src0"),                               // NULL text
      (471L, "", "en", "src1"),                                 // empty
      (472L, " \t\n \r\n  ", "fr", "src2"),                     // whitespace only
      (473L, "a", "de", "src3"),                                // single char
      (474L, ("lorem ipsum dolor sit amet consectetur " * 800).trim, "en", "src4"), // ~30k chars
      (475L, "!!! ??? ... ;;; --- ((( ))) \"\"\" '''", "es", "src5"), // punct only
      (476L, "1234567890 42 42 42 007", "en", "src6"),          // digits only
      (477L, ("spam " * 4000).trim, "en", "src7"),              // one token repeated
      (478L, "สวัสดีครับ นี่คือเอกสารทดสอบ ภาษาไทยไม่มีช่องว่างระหว่างคำ", "th", "src8"),
      (479L, "这是一个测试文档没有空格标点符号也很少词汇密度极高", "zh", "src9"),
      (480L, "👩‍👩‍👧‍👦 🚀🚀🚀 test 🎉 éé café", "en", "src10"),
      (481L, "هذا نص تجريبي باللغة العربية من اليمين إلى اليسار", "ar", "src11"),
      (482L, "\ufeffstart \u0007bell \u001besc end", "en", "src12"), // BOM + control chars
      (483L, "a perfectly normal document with a null language tag", null, "src13"),
      (484L, "unknown language code document body here", "xx", "src14"),
      (485L, "x" * 20000, "en", "src15"),                       // one 20k-char token
      (486L, "\n\n\n\n", "fr", "src16"),                        // newlines only
      (487L, "\t,\t,\t", "de", "src17"),                        // tabs + commas
      (488L, "\u00a0\u2003word\u2009word\u00a0end", "es", "src18"), // non-ASCII spaces
      (489L, "abcщфы中文ไทยabc 123 мир", "en", "src19"))        // mixed scripts
    val stubs = (490 until 500).map(id =>
      (id.toLong, s"one two three ${id}", langs(id % 5), s"src${id % 20}"))
    val rows = (normal.toSeq ++ nasty ++ stubs).map { case (id, t, l, s) =>
      Row(id, t, l, s, if (t == null) null else t.length.toLong)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        schema)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  // ---- adversarial embeddings: 500 rows, dim 64, ids 0..499 -----------
  // 0..489 clustered (10 label centers + noise — kmeans/IVF/PQ need
  // structure); 490..499 the degenerate vectors.
  private def writeEmbeddings(spark: SparkSession, path: String): Unit = {
    val rnd = new scala.util.Random(4242)
    val dim = 64
    val centers = Array.tabulate(10, dim)((l, d) =>
      math.sin(l * 7 + d * 13).toFloat)
    def normalVec(label: Int): Array[Float] =
      Array.tabulate(dim)(d => centers(label)(d) + (rnd.nextFloat() - 0.5f) * 0.2f)
    val normal = (0 until 490).map { id =>
      (id.toLong, normalVec(id % 10), id % 10)
    }
    val nasty: Seq[(Long, Array[Float], Int)] = Seq(
      (490L, Array.fill(dim)(0f), 0),                    // zero vector
      (491L, Array.fill(dim)(1e-30f), 1),                // denormal floats
      (492L, Array.fill(dim)(1e10f), 2),                 // huge components
      (493L, null, 3),                                   // NULL embedding
      (494L, Array.fill(dim)(0.5f), 4),                  // constant vector
      (495L, Array.tabulate(dim)(d => centers(5)(d)), 5),       // exact duplicate pair
      (496L, Array.tabulate(dim)(d => centers(5)(d)), 5),
      (497L, Array.tabulate(dim)(d => if (d % 2 == 0) 1f else -1f), 6),
      (498L, Array.tabulate(dim)(d => if (d == 0) 1f else 0f), 7), // one-hot
      (499L, Array.fill(dim)(-1e10f), 8))                // huge negative
    val rows = (normal ++ nasty).map { case (id, v, l) =>
      Row(id, if (v == null) null else v.toSeq, l)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        schema)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }
}
