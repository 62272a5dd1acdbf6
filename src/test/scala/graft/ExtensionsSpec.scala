package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: SQL-registry injection of the native functions.
  * Extensions apply at session construction, so build a second session
  * over the shared SparkContext, then restore the default.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("graft_dot / graft_cosine / graft_sorted_intersect_size callable from SQL") {
    val base = SparkSpec.session
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(s.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .first().getDouble(0) == 11.0)
      val cos = s.sql(
        """SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                    array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c""".stripMargin)
        .first().getDouble(0)
      assert(cos == 0.0)
      assert(s.sql("SELECT graft_sorted_intersect_size(array(1L,2L,5L), array(2L,5L,9L)) AS n")
        .first().getLong(0) == 2L)
      // zero-vector guard through the SQL surface too
      assert(s.sql(
        "SELECT graft_cosine(array(0.0D, 0.0D), array(1.0D, 2.0D)) AS c")
        .first().getDouble(0) == 0.0)
      // the custom AGGREGATE registers through the same hook
      val mins = s.sql(
        """SELECT graft_kmv_mins(h, 3) AS mins FROM
          |  (SELECT explode(array(9L, 4L, 7L, 1L, 8L, 4L)) AS h)""".stripMargin)
        .first().getSeq[Long](0)
      assert(mins == Seq(1L, 4L, 7L), s"got $mins")
      val grouped = s.sql(
        """SELECT g, graft_kmv_mins(h, 2) AS mins FROM
          |  (SELECT pmod(id, 2) AS g, id * 10 AS h FROM range(10))
          |GROUP BY g ORDER BY g""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(grouped(0L) == Seq(0L, 20L) && grouped(1L) == Seq(10L, 30L))
      // Misra-Gries candidates from SQL: the frequent term must survive
      // a k far below the vocabulary size
      val cands = s.sql(
        """SELECT graft_mg_candidates(t, 2) AS c FROM
          |  (SELECT explode(split('hot hot hot hot hot hot a b c d e f', ' ')) AS t)""".stripMargin)
        .first().getSeq[String](0)
      assert(cands.contains("hot"), s"frequent term evicted: $cands")
      assert(cands.length <= 2)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
