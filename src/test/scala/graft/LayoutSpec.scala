package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: Morton-key math, out-of-range guard, and the
  * physical re-layout property (disjoint sorted key ranges across
  * partitions) that makes file-level skipping work.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave, bit by bit. */
  private def morton(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue matches the reference interleave on a grid") {
    val pairs = for (a <- 0L to 16L; b <- 0L to 16L) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), 5).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == morton(a, b, 5), s"mismatch at ($a, $b)")
    }
  }

  test("zValue preserves locality: close points share high bits") {
    // The defining property: the square [0,31]² splits into 4 quadrants
    // by the top two interleaved bits.
    val q = Seq((3L, 4L), (30L, 2L), (1L, 29L), (28L, 27L)).toDF("a", "b")
      .select(shiftright(Layout.zValue(col("a"), col("b"), 5), 8).as("quad"))
      .as[Long].collect()
    assert(q.toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("out-of-range and null inputs raise loudly") {
    val bad = Seq((1L, 40L)).toDF("a", "b") // 40 >= 2^5
    val e = intercept[Exception] {
      bad.select(Layout.zValue(col("a"), col("b"), 5)).collect()
    }
    assert(e.getMessage.contains("out of [0, 32)"))
    val neg = Seq((-1L, 3L)).toDF("a", "b")
    val e2 = intercept[Exception] {
      neg.select(Layout.zValue(col("a"), col("b"), 5)).collect()
    }
    assert(e2.getMessage.contains("out of [0, 32)"))
  }

  test("zOrdered partitions carry disjoint, internally sorted key ranges") {
    val df = (0L until 1024L).map(i => (i % 32L, (i * 7L) % 32L)).toDF("a", "b")
    val laid = Layout.zOrdered(df, "a", "b", bits = 5, numPartitions = 8)
    val rows = laid
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"), col("__z"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // sorted within each partition
    rows.groupBy(_._1).values.foreach { part =>
      val zs = part.map(_._2).toSeq
      assert(zs == zs.sorted, "keys must be sorted within a partition")
    }
    // ranges disjoint across partitions
    val ranges = rows.groupBy(_._1).map { case (p, rs) =>
      (p, rs.map(_._2).min, rs.map(_._2).max)
    }.toSeq.sortBy(_._2)
    ranges.sliding(2).foreach {
      case Seq((_, _, hi), (_, lo, _)) => assert(hi <= lo, "partition ranges must be disjoint")
      case _ =>
    }
  }

  test("zBucketStats envelopes are tighter than the global range") {
    // uniform grid: every bucket's envelope must cover far less than
    // the full [0,64) span on each axis
    val df = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)).toDF("a", "b")
    val stats = Layout.zBucketStats(df, "a", "b", bits = 6, bucketShift = 8)
      .collect()
    assert(stats.length == 16) // 2^12 z-space >> 8 = 16 buckets
    stats.foreach { r =>
      val (minA, maxA) = (r.getAs[Long]("min_a"), r.getAs[Long]("max_a"))
      val (minB, maxB) = (r.getAs[Long]("min_b"), r.getAs[Long]("max_b"))
      assert(maxA - minA <= 15 && maxB - minB <= 15,
        s"bucket envelope too wide: a [$minA,$maxA] b [$minB,$maxB]")
      assert(r.getAs[Long]("n") == 256L)
    }
  }
}
