package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketed co-located join — the 100 TB fact⋈fact strategy: both
  * sides pre-hashed into the same bucket layout so the join needs no
  * shuffle at read time.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join of orders and lineitem avoids the shuffle") {
    // explicit path options → nothing lands in the default warehouse;
    // table metadata lives in the session's in-memory catalog
    val warehouse = Files.createTempDirectory("graft-warehouse").toString
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$warehouse/orders_b")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.lineitem(spark, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$warehouse/lineitem_b")
      .mode("overwrite").saveAsTable("lineitem_b")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))
    val p = joined.queryExecution.executedPlan.toString
    // join itself must not introduce a shuffle on the join key
    val exchangesBeforeJoin = "Exchange hashpartitioning\\((l|o)_orderkey".r
      .findAllIn(p).size
    assert(exchangesBeforeJoin == 0, s"unexpected join-key shuffle:\n$p")
    // and it still computes the right thing
    val want = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(want).isEmpty && want.exceptAll(joined).isEmpty)
  }
}
