package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("q1 groups are complete and counts add up") {
    val q1 = Relational.q1PricingSummary(spark, sf).cache()
    assert(q1.count() == 6) // 3 returnflags × 2 linestatus
    val totalOrders = q1.agg(sum("count_order")).head().getLong(0)
    val direct = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(totalOrders == direct)
  }

  test("q3 is top-10 by revenue desc") {
    val rows = Relational.q3ShippingPriority(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getDouble(2)).toSeq
    assert(revs == revs.sorted.reverse)
  }

  test("q5 broadcast hint survives into the physical plan") {
    val plan = Relational.q5LocalSupplier(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q6 filters are pushed to the parquet scan") {
    val plan = Relational.q6RevenueDelta(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"))
  }

  test("topk emits at most 3 per customer") {
    val over = Relational.topkPerGroup(spark, sf)
      .groupBy("o_custkey").count().filter(col("count") > 3)
    assert(over.isEmpty)
  }

  test("rollup has per-flag subtotals and a grand total") {
    val r = Relational.rollupSales(spark, sf).cache()
    val grand = r.filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
    assert(grand.count() == 1)
    assert(grand.head().getLong(3) == Tables.lineitem(spark, sf).count())
  }

  test("semiAnti partitions customers exactly") {
    val sa = Relational.semiAnti(spark, sf).cache()
    assert(sa.count() == Tables.customer(spark, sf).count())
    assert(sa.select("c_custkey").distinct().count() == sa.count())
  }

  test("sessionize covers every event exactly once") {
    val sess = Relational.sessionize(spark, sf)
    val covered = sess.agg(sum("n_events")).head().getLong(0)
    assert(covered == Tables.events(spark, sf).count())
  }

  test("sessions respect the 30-minute gap invariant") {
    val sess = Relational.sessionize(spark, sf)
    // within a user, consecutive sessions must be > 30 min apart
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("session_id")
    val bad = sess
      .withColumn("prev_end", lag(col("session_end"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        unix_timestamp(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .minus(unix_timestamp(col("prev_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS")) <= 1800)
    assert(bad.isEmpty)
  }
}
