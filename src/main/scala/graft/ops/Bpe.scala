package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding MERGE TRAINING over word-level token sequences —
  * the trained-tokenizer step the corpus-prep suite's `text_bpe_pairs`
  * (adjacent-pair statistics) feeds in a real pipeline: K rounds of
  * (count adjacent pairs) → (pick the most frequent pair) → (merge
  * every greedy occurrence), producing the ordered merge table that IS
  * a BPE tokenizer's model (Sennrich et al. 2016, ACL — word-level
  * simplification of the byte-level recipe; the reference pipeline has
  * no tokenizer training, this is north-star §2.9 scope).
  *
  * Determinism (oracle contract): the argmax pair breaks ties
  * `(count DESC, left ASC, right ASC)`; merged tokens are
  * `left + "\\u0001" + right` (the U+0001 separator keeps merged tokens
  * distinct from every raw whitespace token, so later rounds can merge
  * merged tokens unambiguously); merge application is CANONICAL greedy
  * left-to-right (a run of eligible positions `p, p+1, …` — only
  * possible when left == right — selects the 1st, 3rd, 5th… of the
  * run, exactly what sequential scanning does).
  *
  * Scale shape: each round is one narrow posexplode + two windows
  * (both partitioned by doc — never global) + one map-side-combinable
  * pair count whose shuffle volume is the distinct-pair vocabulary,
  * plus a 1-ROW collect (the argmax — the model row, the
  * `trainedCentroids` discipline). The sequence frame is re-used
  * across K driver-side rounds, so it is eagerly localCheckpoint-ed
  * per round (the Dedup.clusterLabels lineage-cut rule; plan depth
  * stays flat in K).
  */
object Bpe {

  /** Adjacent-pair frame of a token-array column: one row per
    * position with its token and successor (`nxt` NULL at the end).
    *
    * The successor comes from the ARRAY (`get(toks, p + 1)` — NULL past
    * the end), not a `lead` window: the window form shuffled and sorted
    * every token row by doc_id just to look one element ahead in an
    * array the row already holds. The projection collapses into the
    * Generate's codegen stage, so the array is a local reference per
    * output row, never copied — and the pair-count consumer
    * ([[trainMerges]]'s argmax) now aggregates map-side with NO
    * token-sized exchange at all.
    */
  private def pairFrame(seqs: DataFrame): DataFrame =
    seqs.select(col("doc_id"), col("toks"), posexplode(col("toks")).as(Seq("p", "tok")))
      .select(col("doc_id"), col("p"), col("tok"),
        get(col("toks"), col("p") + 1).as("nxt"))

  /** Apply ONE merge `(left, right) -> merged` canonically greedily to
    * every sequence: eligible positions (tok = left, next = right)
    * group into runs of consecutive p (only left == right can produce
    * a run longer than 1); the 1st, 3rd, … of each run merge, and the
    * consumed right-hand tokens drop out.
    */
  private def applyMerge(seqs: DataFrame, left: String, right: String,
      merged: String): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    // Every window here shares ONE (doc_id, p) spec, so the whole pass
    // is a single exchange + sort. The previous form ranked eligible
    // rows inside a (doc_id, runkey) window — a SECOND full token-sized
    // shuffle per merge — but positions are dense (posexplode), so a
    // run of consecutive eligible positions is a run of consecutive
    // ROWS, and the within-run rank falls out of the running eligible
    // count: for the k-th member of a run, eidx - eidx(run start) =
    // k - 1, so "1st, 3rd, 5th… of the run" ⇔ that difference is even.
    val flagged = pairFrame(seqs)
      .withColumn("elig", col("tok") === left && col("nxt") === right)
      .withColumn("eidx", sum(when(col("elig"), 1).otherwise(0)).over(w))
      // first eligible row of each run (dense p ⇒ the previous ROW)
      .withColumn("rstart",
        col("elig") && !coalesce(lag(col("elig"), 1).over(w), lit(false)))
      // eidx at the current run's start: a running last-value — rows
      // between a run's start and its members are the run itself
      .withColumn("rseidx",
        last(when(col("rstart"), col("eidx")), ignoreNulls = true).over(w))
      .withColumn("sel",
        coalesce(col("elig") && (col("eidx") - col("rseidx")) % 2 === 0, lit(false)))
    flagged
      .withColumn("prevsel", coalesce(lag(col("sel"), 1).over(w), lit(false)))
      .filter(!col("prevsel")) // the right token of a selected pair is consumed
      .groupBy(col("doc_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("p"),
          when(col("sel"), lit(merged)).otherwise(col("tok")).as("t")))),
        x => x.getField("t")).as("toks"))
  }

  /** Train `rounds` BPE merges over the whitespace tokens of
    * `docs(textCol)`. Output: `(merge_round, left_tok, right_tok,
    * pair_count)` — one row per learned merge, `merge_round` 1-based
    * in learning order; `pair_count` is the pair's frequency BEFORE
    * that round's merge applies (standard BPE reporting). Fails
    * loudly if a round finds no adjacent pair (single-token corpus)
    * rather than silently emitting fewer rows.
    */
  def trainMerges(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds ($rounds) must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    var seqs = docs
      .select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("toks"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    for (round <- 1 to rounds) {
      val top = pairFrame(seqs)
        .filter(col("nxt").isNotNull)
        .groupBy(col("tok"), col("nxt")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok").asc, col("nxt").asc)
        .limit(1).collect()
      require(top.nonEmpty,
        s"trainMerges: round $round found no adjacent pair — corpus degenerate")
      val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((round.toLong, l, r, c))
      if (round < rounds)
        seqs = applyMerge(seqs, l, r, l + "\u0001" + r).localCheckpoint(true)
    }
    merges.result().toDF("merge_round", "left_tok", "right_tok", "pair_count")
  }

  /** Apply an ORDERED merge list (the [[trainMerges]] model) to new
    * documents — the tokenizer's serving half: each merge applies
    * canonically greedily in learning order, merged-token names chain
    * with the same U+0001 separator, so a later merge whose side is
    * itself a merged token resolves exactly as it did in training.
    * Output: `(doc_id, toks)` — the segmented sequences, TOTAL over
    * the input docs: a zero-token doc (empty/whitespace text) keeps
    * its row with an empty `toks` array. Totality needs an explicit
    * re-join because each merge pass posexplodes the token array — an
    * empty array emits no rows, so such docs would silently vanish
    * from the fold's groupBy re-assembly. Plan depth: each fold layer
    * stacks a posexplode + two windows, so every 8th merge eagerly
    * localCheckpoints (the [[trainMerges]] per-round rule, amortized)
    * — a realistically sized model (hundreds of merges) must not hand
    * Catalyst a hundreds-deep nested plan.
    *
    * CONTRACT: `idCol` must be UNIQUE over `docs`. The totality
    * re-join keys both sides on `doc_id`, so d copies of one id
    * multiply into d² output rows (each left copy matches every
    * segmented copy) — a silent row explosion, not an error. Callers
    * with possibly-duplicated ids must dedup first; this method does
    * NOT `distinct` for them, because on the honest unique-id corpus
    * that would burn an extra id-sized exchange per call.
    */
  def applyMerges(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("toks"))
    val segmented = merges.zipWithIndex.foldLeft(base) {
      case (seqs, ((l, r), i)) =>
        val next = applyMerge(seqs, l, r, l + "\u0001" + r)
        if ((i + 1) % 8 == 0) next.localCheckpoint(true) else next
    }
    if (merges.isEmpty) segmented
    else
      // doc_id is unique on both sides: one id-sized hash join, no
      // row explosion; the left side column-prunes to doc_id alone
      base.select(col("doc_id"))
        .join(segmented, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("toks"), array().cast("array<string>")).as("toks"))
  }

  /** Tokenizer FERTILITY by group — the per-language (or per-source)
    * fit report of a trained merge table on held-out text: how many
    * BPE tokens the tokenizer spends per unit of raw text in each
    * subset. A tokenizer trained on one distribution over-fragments
    * the others (the standard multilingual-fertility audit, cf.
    * SentencePiece/XLM-R analyses) — this is the table that decision
    * reads. Per group: doc count, total raw/BPE token counts,
    * `compression = n_bpe / n_raw` (1.0 = merges never fire;
    * lower = better fit) and `toks_per_100c = 100 · n_bpe / chars`
    * (the cross-script-comparable rate).
    *
    * Determinism: counts are exact integers; each ratio is ONE
    * division of exact integer sums rounded to 6 dp (never an
    * average of per-doc float ratios — no summation-order hazard);
    * a zero denominator (all-empty group) is NULL via the same guard
    * both engines.
    *
    * Scale shape: [[applyMerges]]'s K narrow per-doc passes (no
    * joins except the final id-sized one), then ONE group-key
    * aggregate that map-side combines to `|groups|` rows — the eval
    * adds one tiny shuffle. Output: `(group, n_docs, n_raw, n_bpe,
    * compression, toks_per_100c)`, one row per group value.
    */
  def fertility(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, charsCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val applied = applyMerges(docs, idCol, textCol, merges)
      .select(col("doc_id"), size(col("toks")).cast("long").as("__bpe"))
    val meta = docs.select(col(idCol).as("doc_id"), col(groupCol),
      col(charsCol).cast("long").as("__chars"),
      size(Dedup.tokens(col(textCol))).cast("long").as("__raw"))
    meta.join(applied, "doc_id")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__raw")).as("n_raw"),
        sum(col("__bpe")).as("n_bpe"),
        sum(col("__chars")).as("__c"))
      .select(col(groupCol), col("n_docs"), col("n_raw"), col("n_bpe"),
        Curation.ratio6(col("n_bpe"), col("n_raw")).as("compression"),
        Curation.ratio6(lit(100L) * col("n_bpe"), col("__c")).as("toks_per_100c"))
  }
}
