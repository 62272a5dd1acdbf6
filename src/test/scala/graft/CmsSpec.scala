package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{CmsAgg, CmsHash}
import graft.ops.{Tables, TextAnalysis}

/** Count–Min sketch: estimates match a naive reimplementation exactly,
  * never undercount, survive partial aggregation (merge), and register
  * through the SQL function surface.
  */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish fixture: term t_i appears 60/i times — guaranteed
  // collisions at width=64 (600+ distinct cells into 4x64)
  private lazy val terms: Seq[String] =
    (1 to 60).flatMap(i => Seq.fill(60 / i)(s"t$i"))

  private def naiveEstimate(all: Seq[String], key: String, depth: Int, width: Int): Long = {
    (0 until depth).map { j =>
      val b = CmsHash.bucket(j, key, width)
      all.count(t => CmsHash.bucket(j, t, width) == b).toLong
    }.min
  }

  test("estimates equal the naive CMS exactly; never below the true count") {
    val df = terms.toDF("term")
    val sketch = df.agg(CmsAgg.cmsAgg(col("term"), 4, 64).as("sk"))
    val est = df.distinct()
      .crossJoin(broadcast(sketch))
      .select(col("term"), CmsAgg.estimate(col("sk"), col("term")).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(est.keySet == exact.keySet)
    var overestimated = 0
    for ((t, e) <- est) {
      assert(e == naiveEstimate(terms, t, 4, 64), s"estimate for $t diverged from naive CMS")
      assert(e >= exact(t), s"CMS must never undercount ($t: est=$e < ${exact(t)})")
      if (e > exact(t)) overestimated += 1
    }
    assert(overestimated > 0, "fixture must actually collide (else the test proves nothing)")
  }

  test("merge: sketch identical under repartitioning (partial aggregation path)") {
    val a = terms.toDF("term").agg(CmsAgg.cmsAgg(col("term"), 4, 64)).first().getAs[Array[Byte]](0)
    val b = terms.toDF("term").repartition(7)
      .agg(CmsAgg.cmsAgg(col("term"), 4, 64)).first().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b), "merge must be order/partition-invariant")
  }

  test("cmsTopTerms: est >= exact on real docs, top-k matches topTerms") {
    val docs = Tables.documents(spark, sf0001)
    val rows = TextAnalysis.cmsTopTerms(docs, "doc_id", "text", limit = 10, depth = 4, width = 512)
      .collect()
    assert(rows.length == 10)
    assert(rows.forall(r => r.getLong(1) >= r.getLong(2)), "est >= exact for every term")
    val expectTop = TextAnalysis.topTerms(docs, "doc_id", "text", limit = 10)
      .collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).toSet == expectTop)
  }

  test("streaming maintenance: merged micro-batch sketches equal one batch build") {
    val in = java.nio.file.Files.createTempDirectory("cms-in").toString
    val store = java.nio.file.Files.createTempDirectory("cms-store").toString + "/sk"
    val docs = (1L to 40L).map(i => (i, s"w${i % 7} w${i % 5} w${i % 3}")).toDF("doc_id", "text")
    docs.filter(col("doc_id") <= 20).write.mode("append").parquet(in)
    val q = graft.streaming.EventStream.cmsSketchStream(spark, in, store, 4, 64)
    try {
      q.processAllAvailable()
      docs.filter(col("doc_id") > 20).write.mode("append").parquet(in)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.streaming.EventStream.readCmsSketch(store, 4, 64)
    val batch = docs
      .select(explode(graft.ops.Dedup.tokens(col("text"))).as("term"))
      .agg(CmsAgg.cmsAgg(col("term"), 4, 64)).first().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(streamed, batch),
      "micro-batch slicing must not move a single sketch cell")
    // the atomic overwrite-rename must leave no orphaned temp files
    val leftovers = new java.io.File(store).listFiles()
      .filter(_.getName.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"orphaned temp files: ${leftovers.mkString(",")}")
    // the fold must honor a CALLER-SUPPLIED Hadoop configuration (and,
    // by the same code path, the session conf it defaults to): resolve
    // the store through a scheme that exists only in the marked conf —
    // a regression back to `new Configuration()` cannot resolve it
    val marked = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    marked.set("fs.graftcms.impl", classOf[GraftCmsTestFs].getName)
    val viaMarked = graft.streaming.EventStream.readCmsSketch(
      s"graftcms:$store", 4, 64, marked)
    assert(java.util.Arrays.equals(viaMarked, batch),
      "readCmsSketch must resolve the store through the conf it was given")
  }

  test("graft_cms / graft_cms_estimate callable from SQL; bad params rejected") {
    val base = SparkSpec.session
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val est = s.sql(
        """SELECT graft_cms_estimate(graft_cms(t, 4, 64), 'x') AS e
          |FROM (SELECT explode(array('x', 'x', 'y')) AS t)""".stripMargin)
        .first().getLong(0)
      assert(est >= 2L, s"x appears twice, estimate must be >= 2 (got $est)")
      val e = intercept[Exception] {
        s.sql("SELECT graft_cms(t, 0, 64) FROM (SELECT 'x' AS t)").collect()
      }
      assert(e.getMessage.contains("graft_cms"), s"bad depth must name the function: ${e.getMessage}")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}

/** Test-only FileSystem registered under the `graftcms:` scheme by the
  * marked-configuration pin above — local-disk semantics, but resolvable
  * ONLY through a Configuration that carries `fs.graftcms.impl`, so a
  * sketch fold that ignores the conf it was given cannot read through it.
  */
class GraftCmsTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftcms:///")
}
