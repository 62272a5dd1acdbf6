package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Token-budget data mixing: the sharded prefix sum must equal the naive
  * global cumsum for any shardWidth, selections must nest as budgets
  * grow, overshoot is bounded by one doc, and membership is independent
  * of input partitioning.
  */
class TokenBudgetSpec extends SparkSpec {
  import spark.implicits._

  // 60 docs, 3 strata, token counts 1..8 — ids chosen so hash order
  // differs from id order
  private lazy val docs = (1L to 60L).map { i =>
    val words = (1 to (i % 8 + 1).toInt).map(j => s"w${i}_$j").mkString(" ")
    (i, Seq("a", "b", "c")((i % 3).toInt), words)
  }.toDF("doc_id", "lang", "text")

  private def naive(d: DataFrame, budgets: Map[String, Long], dflt: Long): DataFrame = {
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(dflt)) {
      case (acc, (k, v)) => when(col("stratum") === k, lit(v)).otherwise(acc)
    }
    d.select(col("doc_id"), col("lang").as("stratum"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"),
        Dedup.h32(col("doc_id").cast("string")).as("__h"))
      .filter(col("n_tokens") > 0)
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(
          Window.partitionBy(col("stratum")).orderBy(col("__h"), col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_before") < budget)
      .select(col("doc_id"), col("stratum"), col("n_tokens"), col("cum_before"))
  }

  private def collectSet(d: DataFrame): Set[(Long, String, Long, Long)] =
    d.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

  private val budgets = Map("a" -> 30L, "b" -> 15L)

  test("sharded prefix sum equals naive global cumsum for any shardWidth") {
    val expected = collectSet(naive(docs, budgets, 20L))
    assert(expected.nonEmpty)
    // 1 shard (width spans the whole 2^32 hash space), many tiny shards,
    // a width coprime to everything, and the default
    for (width <- Seq(1L << 32, 1000L, 7777L, 1L << 24)) {
      val got = collectSet(
        TextAnalysis.tokenBudgetSample(docs, "doc_id", "lang", "text",
          budgets, 20L, shardWidth = width))
      assert(got == expected, s"shardWidth=$width diverged from naive cumsum")
    }
  }

  test("budget growth extends the selection; shrinking selects a prefix") {
    val small = collectSet(TextAnalysis.tokenBudgetSample(
      docs, "doc_id", "lang", "text", Map("a" -> 10L), 8L))
    val large = collectSet(TextAnalysis.tokenBudgetSample(
      docs, "doc_id", "lang", "text", Map("a" -> 25L), 18L))
    assert(small.nonEmpty && small.size < large.size)
    assert(small.subsetOf(large), "smaller budgets must select a subset")
  }

  test("greedy fill: budget met, overshoot bounded by the crossing doc") {
    val want = Map("a" -> 30L, "b" -> 15L, "c" -> 20L)
    val rows = TextAnalysis.tokenBudgetSample(docs, "doc_id", "lang", "text", budgets, 20L)
      .groupBy(col("stratum"))
      .agg(sum(col("n_tokens")).as("tot"), max(col("n_tokens")).as("mx"))
      .collect()
    assert(rows.map(_.getString(0)).toSet == want.keySet, "every stratum selected into")
    for (r <- rows) {
      val (stratum, tot, mx) = (r.getString(0), r.getLong(1), r.getLong(2))
      val b = want(stratum)
      assert(tot >= b, s"$stratum: supply exists, budget must be met (tot=$tot < $b)")
      assert(tot - b < mx, s"$stratum: overshoot ($tot - $b) must be < largest selected doc ($mx)")
    }
  }

  test("membership is independent of input partitioning; zero-token docs excluded") {
    val withEmpty = docs.union(Seq((990L, "a", "   "), (991L, "b", "")).toDF("doc_id", "lang", "text"))
    val base = collectSet(TextAnalysis.tokenBudgetSample(
      withEmpty, "doc_id", "lang", "text", budgets, 20L))
    val shuffled = collectSet(TextAnalysis.tokenBudgetSample(
      withEmpty.repartition(7), "doc_id", "lang", "text", budgets, 20L))
    assert(base == shuffled, "selection must not depend on partitioning")
    assert(!base.exists(r => r._1 == 990L || r._1 == 991L), "zero-token docs never selected")
  }

  test("invalid budgets and shardWidth rejected loudly") {
    intercept[IllegalArgumentException] {
      TextAnalysis.tokenBudgetSample(docs, "doc_id", "lang", "text", Map("a" -> 0L), 10L)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.tokenBudgetSample(docs, "doc_id", "lang", "text", Map.empty, 10L, shardWidth = 0L)
    }
  }

  // --- weightedSample (Efraimidis–Spirakis draw) ---

  private lazy val weighted = docs.withColumn("w",
    size(Dedup.tokens(col("text"))).cast("long"))

  test("temperature mix: alpha=1 is proportional, alpha<1 up-samples small strata, deterministic") {
    // skewed strata: 80 'a', 30 'b', 10 'c'. NOTE the output carries
    // only strata with at least one selected member — rate assertions
    // below are written against the strata that appear.
    val skewed = (1L to 120L).map { i =>
      (i, if (i <= 80) "a" else if (i <= 110) "b" else "c")
    }.toDF("doc_id", "lang")
    def rates(alpha: Double, tf: Double): Map[String, Long] =
      TextAnalysis.temperatureMix(skewed, "doc_id", "lang", alpha, tf)
        .select(col("stratum"), col("rate")).distinct()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha = 1: w_i/wsum = n_i/N, so every stratum's rate collapses to
    // round(100 * targetFrac) — the plain proportional sample
    val prop = rates(1.0, 0.2)
    assert(prop.nonEmpty && prop.values.toSet == Set(20L),
      s"alpha=1 must be flat 20%, got $prop")
    // alpha < 1: hand-checked rates for (80, 30, 10) at tf=0.2 —
    // 100·0.2·120·(√n_i/Σ√n)/n_i — are a=15, b=25, c=43: the smoothing
    // up-samples low-resource strata and all three appear in the output
    val smooth = rates(0.5, 0.2)
    assert(smooth == Map("a" -> 15L, "b" -> 25L, "c" -> 43L),
      s"exponent-smoothed rates diverged from the closed form: $smooth")
    // membership is a pure function of ids — partitioning cannot move it
    val sel = TextAnalysis.temperatureMix(skewed, "doc_id", "lang", 0.5, 0.2)
      .collect().map(_.getLong(0)).toSet
    val selRepart = TextAnalysis.temperatureMix(skewed.repartition(7), "doc_id", "lang", 0.5, 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(sel == selRepart)
    intercept[IllegalArgumentException] {
      TextAnalysis.temperatureMix(skewed, "doc_id", "lang", 0.0, 0.2)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.temperatureMix(skewed, "doc_id", "lang", 0.5, 1.5)
    }
  }

  test("weighted sample: exact k per stratum, matches the key formula, partition-invariant") {
    val got = TextAnalysis.weightedSample(weighted, "doc_id", "lang", "w", k = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got.groupBy(_._2).forall(_._2.size == 4), "each stratum draws exactly k")
    // recompute the draw order naively from the collected weights
    val rows = weighted.select(col("doc_id"), col("lang"), col("w")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (lang, rs) =>
      rs.map { case (id, _, w) =>
        (id, math.log((h32(id.toString) + 1).toDouble / 4294967296.0) / w)
      }.sortBy { case (id, key) => (-key, id) }.take(4)
        .zipWithIndex.map { case ((id, _), i) => (id, lang, i + 1) }
    }.toSet
    assert(got == expected, "draw must equal the ln(u)/w top-k computed naively")
    val shuffled = TextAnalysis.weightedSample(weighted.repartition(7), "doc_id", "lang", "w", 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(shuffled == got, "draw must not depend on partitioning")
  }

  test("weighted sample: zero/NULL weight excluded exactly, negative raises, k >= 1") {
    // zero and NULL weights have zero inclusion probability — the draw
    // over the augmented frame must be IDENTICAL to the base draw (the
    // excluded rows change no rank), at any k
    val aug = weighted.union(Seq(
      (992L, "a", "x", 0L)).toDF("doc_id", "lang", "text", "w"))
      .union(Seq((993L, "a", "x", null.asInstanceOf[java.lang.Long]))
        .toDF("doc_id", "lang", "text", "w"))
    def draw(df: org.apache.spark.sql.DataFrame, k: Int) =
      TextAnalysis.weightedSample(df, "doc_id", "lang", "w", k)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    for (k <- Seq(3, 1000)) {
      val got = draw(aug, k)
      assert(!got.exists(t => t._1 == 992L || t._1 == 993L),
        s"zero/NULL-weight doc drawn at k=$k")
      assert(got == draw(weighted, k),
        s"excluded rows must not perturb the draw (k=$k)")
    }
    // a NEGATIVE weight is a caller bug with no limiting
    // interpretation — still raises at execution, naming the operator
    val neg = weighted.union(Seq((994L, "a", "x", -1L)).toDF("doc_id", "lang", "text", "w"))
    val e = intercept[Exception] {
      TextAnalysis.weightedSample(neg, "doc_id", "lang", "w", 3).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("weightedSample"),
      s"error must name the operator, got: ${e.getMessage}")
    intercept[IllegalArgumentException] {
      TextAnalysis.weightedSample(weighted, "doc_id", "lang", "w", 0)
    }
  }
}
