package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  // local[4, 2]: 4 threads, up to 2 attempts per task — lets the
  // fault-tolerance spec exercise Spark's task re-issue (the
  // reference's Part IV behavior) instead of failing the job on the
  // first injected error.
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // driver-generated parquet carries NAIVE (no-tz) µs timestamps;
    // read them as TIMESTAMP (LTZ, session=UTC) like Spark <3.4 did
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
