package graft

import org.apache.spark.sql.functions._
import graft.ops.Tables

/** Bucketed-table co-located join (SCALING.md claim): writing both join
  * sides bucketed+sorted by the key lets Spark plan a sort-merge join
  * with NO shuffle exchange — the 100 TB fact⋈fact strategy.
  */
class BucketingSpec extends SparkSpec {

  test("pre-bucketed ANN index: batch search never re-shuffles the point side") {
    import graft.ops.SimilaritySearch
    val emb = Tables.embeddings(spark, sf0001)
    emb.filter(col("vec_id") >= 20).withColumnRenamed("vec_id", "point_id")
      .withColumn("b", SimilaritySearch.signBucket("embedding", 3))
      .write.mode("overwrite").bucketBy(4, "b").saveAsTable("ivf_bucketed")
    val res = SimilaritySearch.ivfTopKStored(
      emb.filter(col("vec_id") < 20), spark.table("ivf_bucketed"),
      "vec_id", "point_id", "embedding", "b", bits = 3, k = 3)
    // force the non-broadcast path: this is the million-query batch case
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(res.count() > 0)
      val planStr = res.queryExecution.executedPlan.toString
      // one bucket-key exchange (the query side); an unbucketed point
      // side would add a second. The window's query_id exchange is
      // separate and expected.
      val bucketExchanges = "Exchange hashpartitioning\\(b#".r.findAllIn(planStr).size
      assert(bucketExchanges == 1,
        s"expected only the query side to exchange on the bucket key:\n$planStr")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("trained-IVF stored index: cell join exchanges the query side only") {
    // the sim_ivf_trained_batch composition end-to-end: trained cell
    // assignment persisted bucketBy(cid) + k-row centroid side table.
    // Exactly ONE cid exchange (the probes side) — the stored point
    // side reads with its join distribution already on disk.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("sim_ivf_trained_batch")(spark, sf0001)
      assert(df.count() > 0)
      val planStr = df.queryExecution.executedPlan.toString
      val cidExchanges = "Exchange hashpartitioning\\(cid#".r.findAllIn(planStr).size
      assert(cidExchanges == 1,
        s"expected only the probe side to exchange on the cell id:\n$planStr")
      assert(planStr.contains("SortMergeJoin"),
        s"expected the forced sort-merge cell join:\n$planStr")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("stored BQ signature index: zero point-side exchange, rows ≡ in-plan form") {
    import graft.ops.SimilaritySearch
    // The stored index replaces BOTH costs the in-plan bqRerankTopK
    // pays per batch: the packSignBits projection AND the repartition
    // that fences it out of the pair loop (PlanSpec pins that exchange
    // as load-bearing for the in-plan form). Against the materialized
    // sig column neither exists: scan attributes are values, not
    // deferred expressions, so the plan must carry NO hash exchange on
    // point_id at all — and the results must match row for row.
    val stored = SparkEntry.queries("sim_bq_stored")(spark, sf0001)
    val inPlan = SparkEntry.queries("sim_bq_rerank")(spark, sf0001)
    assert(stored.collect().toSeq == inPlan.collect().toSeq,
      "stored-index BQ search must equal the in-plan form row for row")
    val planStr = stored.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(point_id#".r.findFirstIn(planStr).isEmpty,
      s"stored signature search must not move the point side:\n$planStr")
    assert(planStr.contains("BroadcastNestedLoopJoin"),
      s"pair pass must stay the broadcast scan shape:\n$planStr")
  }

  test("stored prefix index: zero point-side exchange, rows ≡ in-plan form") {
    val stored = SparkEntry.queries("sim_prefix_stored")(spark, sf0001)
    val inPlan = SparkEntry.queries("sim_prefix_rerank")(spark, sf0001)
    assert(stored.collect().toSeq == inPlan.collect().toSeq,
      "stored-index prefix search must equal the in-plan form row for row")
    val planStr = stored.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(point_id#".r.findFirstIn(planStr).isEmpty,
      s"stored prefix search must not move the point side:\n$planStr")
  }

  test("composed IVF+BQ index: one query-side bucket exchange, broadcast rerank fetch") {
    // Three costs, three shapes, one plan: the probe equi-join reads
    // the bucketBy layout (ONE b-exchange, the query side), the
    // Hamming pass reads the stored sig column (no point_id exchange
    // anywhere), and the phase-2 raw-vector fetch is a broadcast id
    // join — the wide column never enters the pair pass.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("sim_ivf_bq")(spark, sf0001)
      assert(df.count() > 0)
      val planStr = df.queryExecution.executedPlan.toString
      val bucketExchanges = "Exchange hashpartitioning\\(b#".r.findAllIn(planStr).size
      assert(bucketExchanges == 1,
        s"expected only the probe side to exchange on the bucket key:\n$planStr")
      assert("Exchange hashpartitioning\\(point_id#".r.findFirstIn(planStr).isEmpty,
        s"the stored index must serve the pair pass without moving points:\n$planStr")
      assert(planStr.contains("BroadcastHashJoin"),
        s"phase-2 fetch must stay a broadcast id join:\n$planStr")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("stored gram-df index: the corpus-sized side never re-shuffles per batch") {
    // dedup_spans_inc probes the bucketBy(16, g) gram-df table; only
    // the batch-gram side may exchange on g. Pin via the stored scan's
    // own expression id: any shuffle of the stored side would appear
    // as an Exchange keyed on THAT g attribute.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("dedup_spans_inc")(spark, sf0001)
      assert(df.count() > 0)
      val planStr = df.queryExecution.executedPlan.toString
      val scan = "graft_span_gram_df\\S*\\[g#(\\d+),".r.findFirstMatchIn(planStr)
      assert(scan.isDefined, s"stored gram-df scan missing:\n$planStr")
      val gid = scan.get.group(1)
      assert(planStr.contains("Bucketed: true"),
        s"stored gram-df scan must read bucketed:\n$planStr")
      // non-digit boundary after the id: g#57 must not match g#578
      val storedExchange = s"Exchange hashpartitioning\\(g#$gid\\D".r
      assert(storedExchange.findFirstIn(planStr).isEmpty,
        s"stored gram-df side must not re-shuffle (g#$gid):\n$planStr")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("stored NB model: the term join never re-shuffles the model side") {
    // pipeline_nb_inc (and the _inc report forms, nb_oov, stream_nb_score)
    // probe the bucketBy(8, term) model table; only the batch-token side
    // may exchange on term. Same pin idiom as the gram-df index: resolve
    // the stored scan's own term attribute id, then assert no Exchange
    // keys on it — the "no model-side join exchange" claim the
    // train-once economics rest on, now plan-pinned.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("pipeline_nb_inc")(spark, sf0001)
      assert(df.count() > 0)
      val planStr = df.queryExecution.executedPlan.toString
      val scan = "graft_nb_model\\S*\\[term#(\\d+),".r.findFirstMatchIn(planStr)
      assert(scan.isDefined, s"stored NB model scan missing:\n$planStr")
      val tid = scan.get.group(1)
      assert(planStr.contains("Bucketed: true"),
        s"stored NB model scan must read bucketed:\n$planStr")
      val storedExchange = s"Exchange hashpartitioning\\(term#$tid\\D".r
      assert(storedExchange.findFirstIn(planStr).isEmpty,
        s"stored NB model side must not re-shuffle (term#$tid):\n$planStr")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("q"), max(col("o_totalprice")).as("p"))
    // force a non-broadcast join so bucketing is what avoids the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(joined.count() > 0)
      // inspect the FINAL adaptive plan (collect() doesn't descend into
      // AdaptiveSparkPlanExec, so assert on the executed-plan string)
      val planStr = joined.queryExecution.executedPlan.toString
      assert(!planStr.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join:\n$planStr")
      assert(planStr.contains("SortMergeJoin") || planStr.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$planStr")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
