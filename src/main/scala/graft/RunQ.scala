package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run named registry queries and show their output + timing —
  * `RunQ <name> [<name> ...]`; repeat a name to see warm-cache timing.
  * sfDir from SPARK_GRAFT_SF_DIR (default sf0.01).
  */
object RunQ {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunQ <queryName> [<queryName> ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // SPARK_GRAFT_SHUFFLE sizes shuffle partitions independently of
      // parallelism for big-decade smokes: a production job sets
      // spark.sql.shuffle.partitions to its data volume as routine, and
      // the 1000x corpus' doc-x-bucket-keyed aggregates (~1.3B groups)
      // need more than the harness's 32 (measured: AGGREGATE_OUT_OF_MEMORY
      // at 32, clean at 256)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query '$name'"))
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(f"[runq] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      df.show(12, 60)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
