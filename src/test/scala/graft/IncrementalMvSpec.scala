package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalMv

class IncrementalMvSpec extends SparkSpec {

  test("incremental MV: two-run merge equals the one-shot rollup " +
      "bit-for-bit and the merge plan reads the persisted view, " +
      "not run-1 raw") {
    import spark.implicits._
    val got = IncrementalMv.mvIncremental(spark, sf).cache()
    // one-shot full-corpus rollup (the oracle's shape)
    val oneShot = Tables.events(spark, sf)
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
    assert(got.count() == oneShot.count())
    assert(got.except(oneShot).isEmpty && oneShot.except(got).isEmpty,
      "incremental merge drifted from the one-shot rollup")
    // artifact property: the merge plan scans the persisted view dir
    val scans = got.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Scan")).mkString("\n")
    assert(scans.contains("graft_mv_store"), s"view store not read:\n$scans")
    got.unpersist()
    // planted merge semantics: existing key accumulates, new key appears
    val store = Seq(("2024-01-01", "a", 2L, BigDecimal("10.00")))
      .toDF("day", "event_type", "n", "rev")
      .select(to_date(col("day")).as("day"), col("event_type"), col("n"),
        col("rev").cast("decimal(38,2)").as("rev"))
    val batch = Seq(
      ("2024-01-01 10:00:00", "a", 5.0),
      ("2024-01-02 11:00:00", "b", 7.5))
      .toDF("ts", "event_type", "value")
      .select(to_timestamp(col("ts")).as("ts"), col("event_type"),
        col("value"))
    val merged = IncrementalMv.mergeWithStore(store, batch)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(merged == Set(("2024-01-01", "a", 3L, 15.0),
      ("2024-01-02", "b", 1L, 7.5)), s"merged=$merged")
  }
}
