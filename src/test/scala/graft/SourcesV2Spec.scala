package graft

import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.functions._

class SourcesV2Spec extends SparkSpec {

  private def grid(rows: Long, slices: Int) =
    spark.read.format("graft.sources.v2.SyntheticSource")
      .option("rows", rows.toString).option("slices", slices.toString)
      .load()

  test("dsv2: the grid is the declared arithmetic, end to end") {
    val got = grid(1000, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(got.length == 1000)
    assert(got(17) == ((17L, 17, (17L * 2654435761L) % 1000000007L)))
    assert(got.map(_._1).toSeq == (0L until 1000L))
  }

  test("dsv2: id-range predicates prune partitions at planning time " +
      "and leave no residual Filter node") {
    val df = grid(200000, 8)
      .filter(col("id") >= 120000L && col("id") < 180000L)
    // 8 slices of 25k over [0, 200k); [120k, 180k) overlaps exactly 4
    assert(df.rdd.getNumPartitions == 4,
      s"partitions=${df.rdd.getNumPartitions}")
    // the absorbed predicates must NOT be re-evaluated above the scan
    val filters = df.queryExecution.executedPlan.collect {
      case f: FilterExec => f
    }
    assert(filters.isEmpty, s"residual filters: $filters")
    assert(df.count() == 60000)
    // a NON-absorbable predicate stays in the plan (conservative path)
    val mixed = grid(1000, 4).filter(col("grp") === 3)
    val residual = mixed.queryExecution.executedPlan.collect {
      case f: FilterExec => f
    }
    assert(residual.nonEmpty, "grp predicate should stay post-scan")
    assert(mixed.count() == 50)
  }

  test("dsv2: column pruning narrows the scan's read schema") {
    val df = grid(1000, 4).select("grp").distinct()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=grp"), plan)
    assert(!plan.contains("cols=id,grp,val"), plan)
    assert(df.count() == 20)
  }

  test("dsv2: the registry query matches the range() oracle shape") {
    val r = SparkEntry.queries("q_dsv2_source")(spark, sf)
      .orderBy("grp").collect()
    assert(r.length == 20)
    // every group sees 60000/20 = 3000 ids
    assert(r.forall(_.getLong(1) == 3000L))
  }
}
