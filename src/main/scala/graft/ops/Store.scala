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
}
