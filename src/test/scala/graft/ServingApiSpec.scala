package graft

import org.apache.spark.sql.functions._
import graft.ops.{Knn, Store, Tables}

/** Vector-store serving-API semantics: payload patch, recommendation
  * search, grouped search.
  */
class ServingApiSpec extends SparkSpec {
  import spark.implicits._

  test("setPayload patches only the named columns of matched rows") {
    val base = Seq((1L, "en", "s0", 10L), (2L, "th", "s1", 20L), (3L, "en", "s2", 30L))
      .toDF("id", "lang", "source", "n")
    val patch = Seq((2L, "xx")).toDF("id", "lang")
    val out = Store.setPayload(base, patch, "id", Seq("lang")).orderBy("id").collect()
    assert(out.length == 3, "row count must be invariant")
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq ==
      Seq((1L, "en", "s0", 10L), (2L, "xx", "s1", 20L), (3L, "en", "s2", 30L)),
      "only row 2's lang may change")
    intercept[IllegalArgumentException] {
      Store.setPayload(base, patch, "id", Seq("id"))
    }
    // duplicate update keys would fan the join out — the lazy in-plan
    // guard must raise at execution, not return extra rows
    val dup = Seq((2L, "xx"), (2L, "yy")).toDF("id", "lang")
    val ex = intercept[Exception] {
      Store.setPayload(base, dup, "id", Seq("lang")).collect()
    }
    assert(ex.getMessage.contains("duplicate update key")
      || Option(ex.getCause).exists(_.getMessage.contains("duplicate update key")),
      s"expected the duplicate-key guard to fire: ${ex.getMessage}")
  }

  test("facetCounts: filtered value histogram, (count DESC, value ASC) page, limit respected") {
    val pts = Seq(
      (1L, "web", 10L), (2L, "web", 20L), (3L, "book", 30L),
      (4L, "book", 5L), (5L, "wiki", 40L), (6L, "chat", 50L)).toDF("id", "src", "n")
    val got = Knn.facetCounts(pts, "src", col("n") >= 10L, limit = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // the n>=10 filter drops one 'book' row; 'web' (2) leads, then the
    // count-1 tie breaks alphabetically: 'book' beats 'chat'/'wiki'
    assert(got == Seq(("web", 2L), ("book", 1L)), s"facet page: $got")
    // no filter: pass col(true); every value appears with its full count
    val all = Knn.facetCounts(pts, "src", lit(true), limit = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(all == Map("web" -> 2L, "book" -> 2L, "wiki" -> 1L, "chat" -> 1L))
    // points MISSING the facet field are excluded (real-API semantics;
    // a NULL bucket would also sort differently across engines)
    val withNull = Seq((1L, Some("web")), (2L, None), (3L, None))
      .toDF("id", "src")
    val nn = Knn.facetCounts(withNull, "src", lit(true), limit = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(nn == Seq(("web", 1L)), s"null facet values must be excluded: $nn")
    // count API: a NULL predicate row does not match (selector semantics)
    val cnt = Knn.countPoints(
      Seq((1L, Some(10L)), (2L, None), (3L, Some(30L))).toDF("id", "n"),
      col("n") >= 20L).first().getLong(0)
    assert(cnt == 1L, s"NULL predicate must not count: $cnt")
  }

  test("scrollPage: keyset pages chain without overlap and drain to empty") {
    val pts = (1L to 25L).map(i => (i, s"v$i")).toDF("id", "v")
    val p1 = Knn.scrollPage(pts, "id", cursor = 0L, pageSize = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(p1 == (1L to 10L), s"page 1: $p1")
    val p2 = Knn.scrollPage(pts, "id", cursor = p1.last, pageSize = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(p2 == (11L to 20L), s"page 2: $p2")
    val p3 = Knn.scrollPage(pts, "id", cursor = p2.last, pageSize = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(p3 == (21L to 25L), s"last short page: $p3")
    assert(Knn.scrollPage(pts, "id", cursor = p3.last, pageSize = 10).count() == 0L,
      "scrolling past the end must be empty")
    // the keyset predicate must reach the parquet scan (the whole point
    // vs OFFSET) and the page must plan as TakeOrderedAndProject, not a
    // global sort
    val dir = java.nio.file.Files.createTempDirectory("scroll").toString + "/t"
    pts.write.parquet(dir)
    val plan = Knn.scrollPage(spark.read.parquet(dir), "id", 10L, 5)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,10)"),
      s"keyset predicate not pushed:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"page not TakeOrdered:\n$plan")
  }

  test("retrievePoints: id-batch lookup, absent ids absent, In predicate pushed") {
    val pts = (1L to 25L).map(i => (i, s"v$i")).toDF("id", "v")
    val got = Knn.retrievePoints(pts, "id", Seq(17L, 3L, 99L, 8L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((3L, "v3"), (8L, "v8"), (17L, "v17")),
      s"page must hold exactly the present ids, id-ordered: $got")
    val e = intercept[IllegalArgumentException] {
      Knn.retrievePoints(pts, "id", Seq.empty)
    }
    assert(e.getMessage.contains("non-empty"))
    // the id batch must reach the parquet scan as an In predicate —
    // the lookup is a pruned scan, not a join over the corpus
    val dir = java.nio.file.Files.createTempDirectory("retrieve").toString + "/t"
    pts.write.parquet(dir)
    val plan = Knn.retrievePoints(spark.read.parquet(dir), "id", Seq(3L, 8L))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("In(id, [3,8])"),
      s"id batch not pushed to the scan:\n$plan")
    assert(!plan.contains("Join"), s"a point lookup must not plan a join:\n$plan")
  }

  test("recommend ranks by the contrastive pseudo-query and excludes examples") {
    // pos p1=(1,0), neg p4=(-1,0) → pseudo-query (1,0)·2/… direction (1,0):
    // p3 (0.7,0.7) scores ~0.707 over p2 (0,1) at 0 — and p1/p4 must not appear
    val pts = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.7f, 0.7f)), (4L, Array(-1.0f, 0.0f)))
      .toDF("pid", "v")
    val out = Knn.recommend(pts, "pid", "v", Seq(1L), Seq(4L), k = 3).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L, 2L),
      s"expected (3, 2) — examples excluded, cosine order: ${out.mkString(", ")}")
    assert(out.head.getDouble(1) > out.last.getDouble(1))
  }

  test("searchGroups: per-group hit caps, group cap, groups ordered by best hit") {
    val emb = Tables.embeddings(spark, sf0001)
    val out = Knn.searchGroups(
      emb.filter(col("vec_id") < 3),
      emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("point_id"), col("embedding"), col("label")),
      "vec_id", "embedding", "point_id", "embedding", "label",
      groupsK = 3, hitsPerGroup = 2)
    val perGroup = out.groupBy("query_id", "group").count()
    assert(perGroup.filter(col("count") > 2).count() == 0, "hitsPerGroup exceeded")
    val groups = out.groupBy("query_id").agg(countDistinct(col("group")).as("g"))
    assert(groups.filter(col("g") > 3).count() == 0, "groupsK exceeded")
    // group_rank order must follow each group's best (hit_rank 1) score
    val best = out.filter(col("hit_rank") === 1)
      .select(col("query_id"), col("group_rank"), col("score")).collect()
      .groupBy(_.getLong(0))
    best.values.foreach { rows =>
      val byRank = rows.sortBy(_.getLong(1)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"group ranking does not follow best-hit score: ${byRank.mkString(",")}")
    }
  }
}
