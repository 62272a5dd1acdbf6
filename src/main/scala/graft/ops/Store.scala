package graft.ops

import org.apache.spark.sql.DataFrame
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

  /** Insert-or-replace by key: rows of `updates` win over `base`. */
  def upsert(base: DataFrame, updates: DataFrame, keyCol: String): DataFrame =
    base.join(updates.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
      .unionByName(updates)

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
    // two-step swap: parquet overwrite of the SOURCE path would delete
    // the input out from under its own scan
    val back = spark.read.parquet(tmp)
    back.write.mode("overwrite").parquet(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }
}
