package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage lifecycle semantics of the reference's collection ops
  * (SURVEY §1.3, §2.1):
  *  - `recreate_collection` (drop-if-exists + create,
  *    `Qdrant/VectorDB/Database.py:10-14`) → `write.mode("overwrite")`;
  *  - `upsert` (insert-or-replace by id,
  *    `Qdrant/VectorDB/Database.py:16-20`) → anti-join + union.
  *
  * Scale: upsert's anti-join shuffles both sides by id once; with the base
  * table bucketed by id the shuffle disappears entirely (bucket-local
  * joins). Overwrite/append are shuffle-free writes.
  */
object Store {

  /** Insert-or-replace by key: rows of `updates` win over `base` —
    * delete-the-old-versions ([[deletePoints]], one definition) + union.
    */
  def upsert(base: DataFrame, updates: DataFrame, keyCol: String): DataFrame =
    deletePoints(base, updates, keyCol).unionByName(updates)

  /** Partition-pruned upsert into a `partitionBy(partitionCol)` parquet
    * table — the 100 TB form of [[upsert]]. The anti-join+union above
    * returns (and on write, rewrites) the FULL table; the real pattern
    * prunes the target to the partitions the update batch touches:
    *  1. collect the batch's distinct partition values (O(batch) — an
    *     update batch touches few partitions by construction),
    *  2. read ONLY those partitions of the base (the literal `isin`
    *     list becomes a PartitionFilter — directory pruning at the
    *     scan, so untouched data is never read, let alone rewritten),
    *  3. anti-join + union within the affected slice,
    *  4. write to a staging dir and swap just the affected partition
    *     directories into place via a TRASH-STAGED swap: per partition,
    *     rename live → trash then staging → live; only after EVERY
    *     partition has swapped are trash and staging deleted. Each step
    *     is a metadata rename, never a data copy, and no byte is
    *     deleted until the whole swap has succeeded — a crash or error
    *     at any point leaves every partition's data intact in exactly
    *     one of live/trash (old bytes) and staging/live (new bytes),
    *     so the interrupted state is manually recoverable (finish or
    *     undo the renames). On a pre-swap failure (write or partition
    *     value validation) the staging dir is cleaned up and live data
    *     is untouched.
    * Untouched partition directories keep their exact files (verified
    * byte-for-byte in OpsSpec). Partition values that Spark URI-escapes
    * in directory names (spaces, slashes, '=', …) are REJECTED before
    * any live data is touched, by checking the raw `col=value` name
    * against the directories Spark actually wrote to staging — not by
    * guessing the escape rules. Remaining limitations (documented, not
    * handled): null partition values; key uniqueness WITHIN a partition
    * is the caller's contract, and a key may not MOVE between
    * partitions (an update row with a changed partition value inserts
    * rather than replaces — the same contract Hive-style partitioned
    * upserts have).
    */
  def upsertPartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
      updates: DataFrame, keyCol: String, partitionCol: String): Unit =
    upsertPartitioned(spark, path, updates, keyCol, partitionCol, Int.MaxValue)

  /** [[upsertPartitioned]] with a fault-injection point: throw after
    * `failAfterSwaps` partition swaps, so OpsSpec can pin the
    * mid-swap-crash contract (no byte deleted, state recoverable).
    */
  private[graft] def upsertPartitioned(spark: org.apache.spark.sql.SparkSession,
      path: String, updates: DataFrame, keyCol: String, partitionCol: String,
      failAfterSwaps: Int): Unit = {
    val partVals = updates.select(col(partitionCol)).distinct().collect().map(_.get(0))
    require(!partVals.contains(null),
      s"upsertPartitioned: null partition value in '$partitionCol' unsupported")
    if (partVals.isEmpty) return
    val base = spark.read.parquet(path)
    val affected = base.filter(col(partitionCol).isInCollection(partVals))
    val merged = affected
      .join(updates.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
      .unionByName(updates.select(base.columns.map(col): _*))
    val root = path.stripSuffix("/")
    val staging = root + "__upserting"
    val trash = root + "__upsert_trash"
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = partVals.map(v => s"$partitionCol=$v")
    // Phase 1 — stage + validate. Nothing under `root` is touched yet,
    // so any failure here cleans up staging and leaves the table as-is.
    try {
      merged.write.mode("overwrite").partitionBy(partitionCol).parquet(staging)
      val escaped = dirs.filterNot(d => fs.exists(new Path(s"$staging/$d")))
      require(escaped.isEmpty,
        s"upsertPartitioned: partition value(s) URI-escaped in directory names " +
          s"(unsupported): expected staging dir(s) ${escaped.mkString(", ")} not found")
    } catch {
      case e: Throwable =>
        fs.delete(new Path(staging), true)
        throw e
    }
    stagedPartitionSwap(fs, root, staging, trash, dirs.toSeq, dirs.toSet, failAfterSwaps)
  }

  /** Shared phase-2/3 of the trash-staged partition swap (see
    * [[upsertPartitioned]]'s contract): per partition dir, rename
    * live → trash then (if a staged replacement exists) staging → live;
    * only after EVERY dir has swapped are trash and staging deleted.
    * `stagedDirs` names the dirs with a replacement in staging — a dir
    * absent from it is REMOVED from live (a fully-deleted partition).
    * On failure staging and trash are deliberately KEPT: deleting
    * either would destroy one side of the recovery story.
    */
  private def stagedPartitionSwap(fs: org.apache.hadoop.fs.FileSystem, root: String,
      staging: String, trash: String, dirs: Seq[String], stagedDirs: Set[String],
      failAfterSwaps: Int): Unit = {
    import org.apache.hadoop.fs.Path
    fs.mkdirs(new Path(trash))
    try {
      dirs.zipWithIndex.foreach { case (d, i) =>
        if (i >= failAfterSwaps)
          throw new java.io.IOException(s"injected test failure before swap of $d")
        val live = new Path(s"$root/$d")
        if (fs.exists(live) && !fs.rename(live, new Path(s"$trash/$d")))
          throw new java.io.IOException(s"rename $live -> $trash/$d failed")
        if (stagedDirs(d) && !fs.rename(new Path(s"$staging/$d"), live))
          throw new java.io.IOException(s"rename $staging/$d -> $live failed")
      }
    } catch {
      case e: Throwable =>
        throw new java.io.IOException(
          s"partitioned rewrite interrupted mid-swap; no data was deleted — old bytes " +
            s"are in $root or $trash, new bytes in $staging or $root; recover by " +
            s"finishing or undoing the per-partition renames", e)
    }
    // all swaps landed; now (and only now) drop the old bytes.
    fs.delete(new Path(trash), true)
    fs.delete(new Path(staging), true): Unit
  }

  /** Point deletion (Qdrant `delete` with a points selector,
    * `qdrant_client.delete(collection, points_selector=[ids…])`): drop
    * the rows whose key appears in `ids`; everything else passes
    * through untouched. Deleting an absent id is a no-op — the
    * idempotent Qdrant contract. One anti-join: both sides shuffle by
    * key once, or zero shuffles with the base bucketed by key.
    */
  def deletePoints(base: DataFrame, ids: DataFrame, keyCol: String): DataFrame =
    base.join(ids.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")

  /** Filter deletion (Qdrant `delete` with a filter selector): drop the
    * rows MATCHING `predicate`. Rows where the predicate evaluates to
    * NULL (a null payload field) do NOT match the filter and are KEPT —
    * the selector semantics that a bare `filter(!predicate)` silently
    * gets wrong (NULL fails both the predicate and its negation, so the
    * row would vanish).
    */
  def deleteByFilter(base: DataFrame, predicate: Column): DataFrame =
    base.filter(!coalesce(predicate, lit(false)))

  /** Partition-pruned point deletion from a `partitionBy(partitionCol)`
    * parquet table — the 100 TB form of [[deletePoints]], sharing
    * [[upsertPartitioned]]'s trash-staged crash-safe swap: only the
    * partitions named by the delete batch are read, rewritten, and
    * swapped; untouched partition directories keep their exact files.
    * A partition whose every row is deleted is REMOVED (its live dir
    * has no staged replacement — the swap's fully-deleted leg).
    *
    * `deletes` carries `(keyCol, partitionCol)` rows — the partition
    * value rides the batch so the prune never scans the base to locate
    * keys, and deletion is by PAIR: the batch row `(7, en)` deletes
    * key 7 from partition en only, never from another partition the
    * same batch happens to touch (keys are unique within a partition
    * by the store contract, not globally).
    *
    * Two guards protect the swap, both failing BEFORE any live byte
    * moves. (1) Because a delete can EMPTY a partition, the upsert
    * path's staging-dir existence check cannot distinguish a
    * URI-escaped directory name from a fully-deleted partition;
    * partition values are therefore restricted to `[A-Za-z0-9_.-]+`.
    * (2) Values Spark's partition TYPE INFERENCE rewrites on read-back
    * (the string `"01"` reads as int `1`, so survivors stage under
    * `col=1` while the batch names `col=01`) would make the swap treat
    * the partition as fully deleted and drop the staged survivors —
    * any staged directory not named exactly as the batch constructed
    * it is rejected, staging cleaned, live untouched. A delete that
    * would remove the table's LAST partition directory is also
    * refused (the bare root is unreadable parquet; use [[recreate]]
    * with an empty frame for delete-all).
    */
  def deletePartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
      deletes: DataFrame, keyCol: String, partitionCol: String): Unit =
    deletePartitioned(spark, path, deletes, keyCol, partitionCol, Int.MaxValue)

  /** [[deletePartitioned]] with the fault-injection point OpsSpec uses
    * to pin the mid-swap-crash contract (no byte deleted, recoverable).
    */
  private[graft] def deletePartitioned(spark: org.apache.spark.sql.SparkSession,
      path: String, deletes: DataFrame, keyCol: String, partitionCol: String,
      failAfterSwaps: Int): Unit = {
    val partVals = deletes.select(col(partitionCol)).distinct().collect().map(_.get(0))
    require(!partVals.contains(null),
      s"deletePartitioned: null partition value in '$partitionCol' unsupported")
    val bad = partVals.filterNot(v => v.toString.matches("[A-Za-z0-9_.-]+"))
    require(bad.isEmpty,
      s"deletePartitioned: partition value(s) ${bad.mkString(", ")} contain characters " +
        "outside [A-Za-z0-9_.-] — a fully-deleted partition is indistinguishable from a " +
        "URI-escaped directory name, so such values are unsupported here")
    if (partVals.isEmpty) return
    val base = spark.read.parquet(path)
    // pair-wise anti-join: (key, partition) rows delete exactly their pair
    val remaining = base.filter(col(partitionCol).isInCollection(partVals))
      .join(deletes.select(col(keyCol), col(partitionCol)).distinct(),
        Seq(keyCol, partitionCol), "left_anti")
    val root = path.stripSuffix("/")
    val staging = root + "__deleting"
    val trash = root + "__delete_trash"
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = partVals.map(v => s"$partitionCol=$v").toSeq
    // stage the survivors + validate; any failure cleans staging, live untouched
    try {
      remaining.write.mode("overwrite").partitionBy(partitionCol).parquet(staging)
      // guard (2): a staged dir named differently than the batch constructed
      // it means partition type inference rewrote the value on read-back —
      // the swap below would mistake the partition for fully-deleted and
      // phase 3 would drop the staged survivors. Reject pre-swap.
      val unexpected = fs.listStatus(new Path(staging)).map(_.getPath.getName)
        .filter(_.startsWith(s"$partitionCol=")).toSet -- dirs.toSet
      require(unexpected.isEmpty,
        s"deletePartitioned: staged partition dir(s) ${unexpected.mkString(", ")} do not " +
          s"match the batch's value(s) ${dirs.mkString(", ")} — partition type inference " +
          "rewrote the value on read-back (e.g. string '01' reads as int 1); such values " +
          "are unsupported here")
      // guard (3): never leave the root with zero partition dirs — the bare
      // root is unreadable parquet. Delete-all is recreate's job.
      val liveAfter = fs.listStatus(new Path(root)).map(_.getPath.getName)
        .filter(_.startsWith(s"$partitionCol=")).toSet -- dirs.toSet ++
        dirs.filter(d => fs.exists(new Path(s"$staging/$d"))).toSet
      require(liveAfter.nonEmpty,
        "deletePartitioned: this batch would remove the table's last partition " +
          "directory, leaving an unreadable store — use recreate with an empty " +
          "frame for delete-all")
    } catch {
      case e: Throwable =>
        fs.delete(new Path(staging), true)
        throw e
    }
    val staged = dirs.filter(d => fs.exists(new Path(s"$staging/$d"))).toSet
    stagedPartitionSwap(fs, root, staging, trash, dirs, staged, failAfterSwaps)
  }

  /** Payload update (Qdrant `set_payload`,
    * `qdrant_client.set_payload(collection, payload, points)`): patch
    * METADATA columns of matched points, leaving every other column —
    * crucially the embedding — untouched. The row-upsert above would
    * force callers to re-supply (and at 100 TB re-shuffle) the whole
    * row including its vector; this is a left join + per-column
    * coalesce, so unmatched rows pass through unchanged, matched rows
    * change only the named payload columns, and row count is
    * invariant. `updates` must carry `keyCol` + exactly `payloadCols`
    * and be KEY-UNIQUE: a duplicated update key would fan the left
    * join out (row count silently grows, patches race), so the plan
    * embeds a lazy per-key-count guard that RAISES at execution on the
    * first duplicate (the jaccardPairs guard discipline — no eager
    * count at construction; one window over the small update set).
    */
  def setPayload(base: DataFrame, updates: DataFrame, keyCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "setPayload: no payload columns named")
    require(!payloadCols.contains(keyCol), s"setPayload: key '$keyCol' is not payload")
    val wk = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    val u = updates
      .select((col(keyCol) +: payloadCols.map(c => col(c).as(s"__u_$c"))): _*)
      .withColumn("__k_n", count(lit(1)).over(wk))
    base.columns.foldLeft(base.join(u, Seq(keyCol), "left")) { (df, c) =>
      if (payloadCols.contains(c))
        // the guard rides the patched column so Catalyst cannot prune it
        df.withColumn(c,
          when(col("__k_n") > 1, raise_error(concat(
            lit(s"setPayload: duplicate update key in '$keyCol' ("), col(keyCol).cast("string"),
            lit(") — patches must be key-unique"))))
            .otherwise(coalesce(col(s"__u_$c"), col(c))))
      else df
    }.drop("__k_n").drop(payloadCols.map(c => s"__u_$c"): _*)
  }

  def recreate(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def append(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Small-file compaction: incremental `append` writes (streams,
    * micro-batch upserts) accumulate one file per task per batch, and at
    * 100 TB the scan's task count — and the namenode/listing load — is
    * driven by FILE count, not data size. Rewrite the table into
    * `ceil(rows / rowsPerFile)` files, range-partitioned by the sort key
    * so each output file covers a tight key interval (min/max footer
    * stats then let later scans skip whole files on key predicates).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      sortCol: String, rowsPerFile: Long): Unit = {
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / rowsPerFile).toInt)
    val tmp = path.stripSuffix("/") + "__compacting"
    df.repartitionByRange(files, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(tmp)
    // swap via RENAME, not a second write: re-writing tmp would re-scan
    // it with size-ordered bin-packing and destroy the range-partitioned
    // sorted layout (overlapping min/max footers, arbitrary file count)
    // that this function exists to produce — and write the data twice.
    swapDirs(spark, tmp, path)
  }

  /** Snapshot diff of two corpus versions: per-id status
    * `added | removed | changed | unchanged`, decided on a content
    * hash. Only (id, 64-hex-char sha256) reaches the full-outer join's
    * exchange — the document texts are hashed at the scan and never
    * shuffle, so diffing two 100 TB snapshots moves ~70 bytes per doc.
    * With both snapshots bucketed by id even that exchange disappears
    * (bucket-local join). This is the audit step between corpus
    * versions a training pipeline runs before re-deduplicating: the
    * `added`/`changed` rows are exactly the incremental batch to feed
    * [[Dedup.incrementalDedup]].
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val o = oldDocs.select(col(idCol).as("doc_id"), sha2(col(textCol), 256).as("old_hash"))
    val n = newDocs.select(col(idCol).as("doc_id"), sha2(col(textCol), 256).as("new_hash"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") === col("new_hash"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col("doc_id"), col("status"))
  }

  /** Replace `destPath` with `srcPath` by delete+rename (both on the
    * same FileSystem). Not atomic across the two calls — callers that
    * need crash-safety should version directories instead — but it
    * never rewrites data and never leaves the staging dir behind.
    */
  def swapDirs(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, destPath: String): Unit = {
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val dest = new org.apache.hadoop.fs.Path(destPath)
    // resolve the FS from the PATH, not the default FS: with the store
    // on s3a:// or hdfs:// and fs.defaultFS elsewhere, FileSystem.get
    // would operate on the wrong filesystem or throw "Wrong FS"
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dest, true)
    if (!fs.rename(src, dest))
      throw new java.io.IOException(s"rename $srcPath -> $destPath failed")
  }
}
