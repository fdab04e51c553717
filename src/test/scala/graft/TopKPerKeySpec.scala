package graft

import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey

class TopKPerKeySpec extends SparkSpec {

  test("custom TopKPerKey matches the window formulation exactly") {
    val got = SparkEntry.queries("q_topk_custom")(spark, sf)
    val want = graft.operators.Relational.topkPerGroup(spark, sf)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("physical plan is partial → exchange → final, not a window sort") {
    val df = SparkEntry.queries("q_topk_custom")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyPartial"))
    assert(p.contains("TopKPerKey "))
    assert(!p.contains("WindowExec") && !p.contains("Window "))
    assert(p.contains("Exchange"))
  }

  test("partial phase bounds shuffle rows to k per key per partition") {
    // total rows reaching the final phase ≤ k × keys × input partitions
    val df = TopKPerKey(
      Tables.orders(spark, sf).repartition(4)
        .select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq("o_custkey"), Seq("o_totalprice" -> true, "o_orderkey" -> false), 2)
    val keys = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(df.count() <= 2 * keys)
    assert(df.filter(col("rnk") > 2).isEmpty)
  }

  test("optimizer rule rewrites window top-k into the custom operator") {
    import graft.plans.{RewriteWindowTopK, TopKStrategy}
    val exp = spark.experimental
    val prevOpt = exp.extraOptimizations
    val prevStrat = exp.extraStrategies
    try {
      exp.extraOptimizations = prevOpt :+ RewriteWindowTopK
      if (!prevStrat.contains(TopKStrategy))
        exp.extraStrategies = prevStrat :+ TopKStrategy
      // the plain WINDOW formulation...
      val viaWindow = graft.operators.Relational.topkPerGroup(spark, sf)
      // ...now plans through the custom operator
      val p = viaWindow.queryExecution.executedPlan.toString
      assert(p.contains("TopKPerKeyPartial"), s"rule did not fire:\n$p")
      assert(!p.contains("WindowExec") && !p.contains("WindowGroupLimit"),
        s"window machinery still present:\n$p")
      // and still produces the identical result
      exp.extraOptimizations = prevOpt
      val want = graft.operators.Relational.topkPerGroup(spark, sf)
      exp.extraOptimizations = prevOpt :+ RewriteWindowTopK
      assert(viaWindow.exceptAll(want).isEmpty && want.exceptAll(viaWindow).isEmpty)
    } finally {
      exp.extraOptimizations = prevOpt
      exp.extraStrategies = prevStrat
    }
  }

  test("registry sql_topk_rewrite plans through the operator, not a " +
      "window (the SQL-authored shape, not just the DataFrame one)") {
    val exp = spark.experimental
    val prevOpt = exp.extraOptimizations
    val prevStrat = exp.extraStrategies
    try {
      val df = graft.SparkEntry.queries("sql_topk_rewrite")(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("TopKPerKeyPartial"), s"rule did not fire:\n$p")
      assert(!p.contains("WindowExec") && !p.contains("WindowGroupLimit"),
        s"window machinery still present:\n$p")
    } finally {
      exp.extraOptimizations = prevOpt
      exp.extraStrategies = prevStrat
    }
  }

  test("ascending order and rank-1-per-key invariants") {
    val df = TopKPerKey(
      Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq("o_custkey"), Seq("o_orderkey" -> false), 1)
    // k=1 ascending by orderkey == min orderkey per customer
    val want = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(min("o_orderkey").as("o_orderkey"))
    val got = df.select("o_custkey", "o_orderkey")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
