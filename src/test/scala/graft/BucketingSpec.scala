package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join — the 100 TB fact⋈fact strategy: both
  * sides pre-hashed into the same bucket layout so the join needs no
  * shuffle at read time. Drives the same `q_bucketed_join` entry the
  * driver gate hashes.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join of orders and lineitem avoids the shuffle") {
    val joined = sources.Formats.bucketedOrdersLineitemJoin(spark, sf)
    val p = joined.queryExecution.executedPlan.toString
    // join itself must not introduce a shuffle on the join key (the
    // aggregate's exchange on the group keys is expected and fine)
    val exchangesBeforeJoin = "Exchange hashpartitioning\\((l|o)_orderkey".r
      .findAllIn(p).size
    assert(exchangesBeforeJoin == 0, s"unexpected join-key shuffle:\n$p")
    // and it still computes the right thing
    val want = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_qty"))
    assert(joined.exceptAll(want).isEmpty && want.exceptAll(joined).isEmpty)
  }
}
