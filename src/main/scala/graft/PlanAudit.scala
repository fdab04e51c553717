package graft

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for plan-hygiene review: filter/
  * projection pushdown into the parquet scan, broadcast vs shuffle
  * join choices, whole-stage-codegen coverage.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val which = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // driver-generated parquet carries NAIVE (no-tz) µs timestamps;
      // read them as TIMESTAMP (LTZ, session=UTC) like Spark <3.4 did
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (which.isEmpty || which.contains(name)) {
        println(s"\n======== $name ========")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"plan failed: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
