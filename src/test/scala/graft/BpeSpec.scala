package graft

import org.apache.spark.sql.functions.col
import graft.ops.{Bpe, Tables}

/** BPE merge-training edge semantics: canonical greedy run selection
  * on repeated tokens, cross-round merging of merged tokens, and the
  * deterministic argmax tie-break.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("repeated-token runs merge greedily left-to-right; merges chain across rounds") {
    // doc 1: "a a a a a" — round 1 must pick (a, a) with count 4 (all
    // four adjacent pairs, overlapping), and apply it greedily to
    // [aa, aa, a] (positions 1, 3 consumed — NOT [aa, a, aa] or a
    // re-merge of the fresh aa tokens).
    // doc 2: "b c b c" — untouched by round 1; round 2's argmax must
    // then be (b, c) with count 2, beating doc 1's post-merge pairs
    // (each count 1).
    val docs = Seq((1L, "a a a a a"), (2L, "b c b c")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "doc_id", "text", rounds = 2)
      .orderBy("merge_round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(merges == Seq((1L, "a", "a", 4L), (2L, "b", "c", 2L)),
      s"merge table wrong: $merges")
  }

  test("merged tokens stay distinct from raw tokens and merge again deterministically") {
    // "x x x x" → round 1: (x, x) c=3 → [xx, xx]. Round 2's only pair
    // is (xx, xx) c=1 — the merged token (with its U+0001 separator)
    // must be merge-able like any other, and must NOT collide with a
    // raw token literally spelled "xx" elsewhere in the corpus.
    val docs = Seq((1L, "x x x x"), (2L, "xx yy")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "doc_id", "text", rounds = 2)
      .orderBy("merge_round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // round 2 is a c=1 TIE between (x+sep+x, x+sep+x) and (xx, yy);
    // the binary tie-break picks the merged pair: U+0001 < 'x'
    val m = "x\u0001x"
    assert(merges == Seq((1L, "x", "x", 3L), (2L, m, m, 1L)),
      s"merge table wrong: $merges")
  }

  test("training is invariant to input partitioning") {
    // the argmax tie-break and the per-doc windows are total orders,
    // so how rows land in partitions must not move any merge
    val docs = Tables.documents(spark, sf0001).filter(col("doc_id") < 60)
    def at(parts: Int) =
      Bpe.trainMerges(docs.repartition(parts), "doc_id", "text", rounds = 3)
        .orderBy("merge_round").collect().toSeq
    assert(at(1) == at(7), "merge table must not depend on partitioning")
  }

  test("applyMerges over >= 8 merges (the checkpointed fold) reproduces training state") {
    // The every-8th-fold localCheckpoint branch only fires past 7
    // merges — no registered query reaches it (the checked model is 4
    // merges), so pin it here: applying the FIRST 8 merges of a
    // 9-merge model to the training corpus must land in exactly the
    // state trainMerges itself was in when it picked merge 9 — i.e.
    // the most frequent adjacent pair of the applied sequences IS the
    // model's 9th row. A checkpoint that corrupted or reordered the
    // sequences would move that argmax.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0001).filter(col("doc_id") < 60)
    val model = Bpe.trainMerges(docs, "doc_id", "text", rounds = 9)
      .orderBy("merge_round").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    val applied = Bpe.applyMerges(docs, "doc_id", "text",
      model.take(8).map { case (l, r, _) => (l, r) }.toSeq)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val top = applied
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("p", "tok")))
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("tok"), col("nxt")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc, col("nxt").asc)
      .first()
    assert((top.getString(0), top.getString(1), top.getLong(2)) == model(8),
      s"post-8-merge argmax ${(top.getString(0), top.getString(1), top.getLong(2))} " +
        s"!= trained merge 9 ${model(8)}")
  }

  test("applyMerges is total: zero-token docs keep a row with empty toks (ADVICE r12)") {
    // posexplode of an empty token array emits no rows, so without the
    // explicit re-join a whitespace-only doc would silently vanish
    // from the serving output — a tokenizer must answer for EVERY doc
    // it was handed, with [] for empty text, not absence.
    val docs = Seq((1L, "a b a b"), (2L, "   "), (3L, "")).toDF("doc_id", "text")
    val out = Bpe.applyMerges(docs, "doc_id", "text", Seq(("a", "b")))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList))
    assert(out.map(_._1).toList == List(1L, 2L, 3L),
      s"output must cover every input doc: ${out.toList}")
    assert(out(1)._2.isEmpty && out(2)._2.isEmpty,
      s"zero-token docs must segment to []: ${out.toList}")
    assert(out(0)._2 == List("a\u0001b", "a\u0001b"),
      s"merged doc wrong: ${out.toList}")
  }

  test("degenerate single-token corpus fails loudly") {
    val docs = Seq((1L, "only"), (2L, "single")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.trainMerges(docs, "doc_id", "text", rounds = 1).collect()
    }
    assert(e.getMessage.contains("no adjacent pair"))
  }
}
