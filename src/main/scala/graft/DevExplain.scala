package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: print the formatted physical plan of one registry query. */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    println("[devexplain-begin]")
    println(df.queryExecution.executedPlan.toString)
    println("[devexplain-end]")
    spark.stop()
  }
}
