package graft

import org.apache.spark.sql.functions._
import graft.ops.Tables

/** Pins the scale-smoke generator's load-bearing invariants. The smoke's
  * verdicts rest on deterministic counts staying linear in `copies`;
  * that only holds if inflation introduces NO new duplicate groups —
  * the exact bug caught at copies=30 (a 10-period text rotation planted
  * verbatim clone triples and exploded MinHash candidates 70×, see
  * SCALING.md "Second decade").
  */
class ScaleGenSpec extends SparkSpec {

  private lazy val outDir = {
    val dir = java.nio.file.Files.createTempDirectory("scalegen").toString
    // copies=13 straddled BOTH v1 perturbation sub-periods (10 for the
    // text rotation halves, 11 for the pre-fix embedding modulus) — kept
    // as the historical regression configuration, shrunk to fixture
    // scale; the v2 permutation scheme has no sub-10 period to straddle
    // but every invariant below must still hold
    ScaleGen.inflate(spark, sf0001, dir, copies = 13)
    dir
  }

  test("replica text mappings: pairwise distinct, near-disjoint, identity first, full range") {
    // the structural guarantee that replaced v1's alphabet-period
    // argument: for the FULL copies=1000 range every pair of replica
    // bijections is distinct AND agrees on <= 8 of the 20 positions
    // (two near-identical bijections would make near-dup replicas —
    // the cross-decade hole that blocked dedup smokes on the r17
    // data/scale1000), each mapping is a permutation of the alphabet,
    // and replica 0 is the identity (the source corpus verbatim)
    val ms = ScaleGen.mappings(1000)
    assert(ms.length == 1000 && ms.distinct.length == 1000, "mappings must be pairwise distinct")
    assert(ms(0) == "aeioubcdfghjklmnpqrs", "replica 0 must be the identity mapping")
    assert(ms.forall(_.sorted == "aeioubcdfghjklmnpqrs".sorted),
      "every mapping must be a permutation of the alphabet")
    var worst = 0
    for (i <- ms.indices; j <- (i + 1) until ms.length) {
      val a = ms(i).indices.count(p => ms(i)(p) == ms(j)(p))
      if (a > worst) worst = a
    }
    assert(worst <= 8, s"two replica mappings agree on $worst/20 positions (max allowed 8)")
    // determinism: a second construction is bit-identical
    assert(ScaleGen.mappings(1000).sameElements(ms), "mappings must be deterministic")
  }

  test("row counts are exactly copies-linear for every inflated table") {
    for (t <- Seq("documents", "embeddings", "events", "lineitem", "orders", "customer")) {
      val src = spark.read.parquet(s"$sf0001/$t.parquet").count()
      val out = spark.read.parquet(s"$outDir/$t.parquet").count()
      assert(out == 13 * src, s"$t: $src -> $out, expected ${13 * src}")
    }
  }

  test("no new duplicate-text groups: max clone-group size is preserved") {
    def maxGroup(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(col("text")).count().agg(max(col("count"))).head().getLong(0)
    val srcMax = maxGroup(Tables.documents(spark, sf0001))
    val outMax = maxGroup(spark.read.parquet(s"$outDir/documents.parquet"))
    // replicas of a duplicate GROUP stay duplicates of each other within
    // their replica (the bijection preserves equality), but must never
    // merge across replicas — so the max group size cannot grow
    assert(outMax == srcMax,
      s"inflation changed the largest duplicate-text group: $srcMax -> $outMax")
  }

  test("no verbatim embedding clones across replicas") {
    def maxGroup(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(col("embedding")).count().agg(max(col("count"))).head().getLong(0)
    val srcMax = maxGroup(Tables.embeddings(spark, sf0001))
    val outMax = maxGroup(spark.read.parquet(s"$outDir/embeddings.parquet"))
    assert(outMax == srcMax,
      s"inflation changed the largest duplicate-vector group: $srcMax -> $outMax")
  }

  test("replica signed permutations: orthogonal, pairwise non-near-identical, identity first, full range") {
    // the mappings() guarantee applied to vectors (v2, r19): every
    // replica transform is a signed permutation (an exact isometry —
    // within-replica geometry replicates verbatim), replica 0 is the
    // identity, and no pair agrees (same source dim AND sign) on more
    // than dim/4 output positions — two near-identical isometries
    // would leave replica pairs of one source vector near-parallel,
    // the cosine-space clone hole the affine-only r17/r18 transform
    // had (replica pairs at cosine ~0.9998)
    val dim = 64
    val sp = ScaleGen.signedPerms(1000, dim)
    assert(sp.length == 1000)
    assert(sp(0)._1.sameElements(Array.tabulate(dim)(identity)) &&
      sp(0)._2.forall(_ == 1.0f), "replica 0 must be the identity isometry")
    sp.foreach { case (p, sg) =>
      assert(p.sorted.sameElements(Array.tabulate(dim)(identity)),
        "every perm must be a permutation of the dims")
      assert(sg.forall(s => s == 1.0f || s == -1.0f), "signs must be exactly ±1")
    }
    var worst = 0
    for (i <- sp.indices; j <- (i + 1) until sp.length) {
      val a = (0 until dim).count(d =>
        sp(i)._1(d) == sp(j)._1(d) && sp(i)._2(d) == sp(j)._2(d))
      if (a > worst) worst = a
    }
    assert(worst <= dim / 4,
      s"two signed perms agree on $worst/$dim positions (max allowed ${dim / 4})")
    // determinism: a second construction is bit-identical
    val sp2 = ScaleGen.signedPerms(1000, dim)
    assert(sp.indices.forall(k =>
      sp(k)._1.sameElements(sp2(k)._1) && sp(k)._2.sameElements(sp2(k)._2)),
      "signedPerms must be deterministic")
  }

  test("no cross-replica NEAR-PARALLEL embedding clones (cosine bounded away from 1)") {
    // the structural guarantee the sim_semdedup smoke rests on: a
    // replica pair of one source vector relates by a random isometry,
    // so its cosine sits in the background band (sd ≈ 1/√dim), never
    // near 1 — the affine-only transform failed this at ~0.9998 for
    // EVERY pair, a near-dup clique per source vector
    val emb = spark.read.parquet(s"$outDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val srcMax = Tables.embeddings(spark, sf0001)
      .agg(max(col("vec_id"))).head().getLong(0)
    val stride = srcMax + 1
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
    }
    var worst = 0.0
    emb.groupBy(_._1 % stride).foreach { case (_, replicas) =>
      val vs = replicas.map(_._2)
      for (i <- vs.indices; j <- (i + 1) until vs.length) {
        val c = math.abs(cos(vs(i), vs(j)))
        if (c > worst) worst = c
      }
    }
    assert(worst < 0.9,
      f"a cross-replica pair of one source vector reads |cosine| = $worst%.4f — " +
        "the near-parallel clone hole is back")
  }

  test("ids never collide and fact join alignment is preserved") {
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    assert(docs.select(col("doc_id")).distinct().count() == docs.count())
    val li = spark.read.parquet(s"$outDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$outDir/orders.parquet")
    val srcJoin = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey")).count()
    val outJoin = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    assert(outJoin == 13 * srcJoin,
      s"join alignment broke: $srcJoin -> $outJoin, expected ${13 * srcJoin}")
  }

  test("degenerate inputs gain no clones: zero vectors and unrotatable text") {
    import spark.implicits._
    // a source whose perturbation-resistant rows would clone under a
    // purely multiplicative / rotation-only scheme: an all-zero
    // embedding and a text containing none of the 20 rotated letters
    val srcDir = java.nio.file.Files.createTempDirectory("scalegen-degen").toString
    Seq((0L, "12345 678 999", 13), (1L, "the quick brown fox", 7))
      .toDF("doc_id", "text", "n_chars")
      .write.parquet(s"$srcDir/documents.parquet")
    Seq((0L, Array.fill(8)(0.0f), 0), (1L, Array.tabulate(8)(_.toFloat / 8), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$srcDir/embeddings.parquet")
    // remaining tables: reuse the fixture's via the loader contract
    for (t <- Seq("events", "lineitem", "orders", "customer",
        "part", "supplier", "nation", "region"))
      spark.read.parquet(s"$sf0001/$t.parquet").write.parquet(s"$srcDir/$t.parquet")
    val outDir = java.nio.file.Files.createTempDirectory("scalegen-degen-out").toString
    ScaleGen.inflate(spark, srcDir, outDir, copies = 12)
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    assert(docs.groupBy(col("text")).count().agg(max(col("count"))).head().getLong(0) == 1L,
      "digits-only text cloned across replicas")
    val emb = spark.read.parquet(s"$outDir/embeddings.parquet")
    assert(emb.groupBy(col("embedding")).count().agg(max(col("count"))).head().getLong(0) == 1L,
      "zero vector cloned across replicas")
  }

  test("strideOf: clear errors on empty table and non-integral key") {
    import spark.implicits._
    val empty = intercept[IllegalArgumentException] {
      ScaleGen.strideOf(Seq.empty[Long].toDF("id"), "id")
    }
    assert(empty.getMessage.contains("no rows"))
    val wrongType = intercept[IllegalArgumentException] {
      ScaleGen.strideOf(Seq("a", "b").toDF("id"), "id")
    }
    assert(wrongType.getMessage.contains("integral"))
    // int key widens cleanly (Number path), not just bigint
    assert(ScaleGen.strideOf(Seq(1, 7, 3).toDF("id"), "id") == 8L)
  }

  test("replica 0 is the source verbatim") {
    val src = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val stride = Tables.documents(spark, sf0001)
      .agg(max(col("doc_id"))).head().getLong(0) + 1
    val rep0 = spark.read.parquet(s"$outDir/documents.parquet")
      .filter(col("doc_id") < stride).select(col("doc_id"), col("text"))
    assert(rep0.exceptAll(src).count() == 0 && src.exceptAll(rep0).count() == 0)
  }
}
