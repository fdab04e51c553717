package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** AUTO-STRATEGY JOIN PRE-FLIGHT (SURVEY §2.B) — the decision loop
  * the planner-pre-flight family was built for, closed: `q_join_size`
  * prices a join from the two per-key count tables and
  * `q_skew_report` profiles its key skew; this operator reads those
  * numbers BEFORE the join runs, picks the physical strategy a 100 TB
  * planner would —
  *
  *   - build side fits a task → BROADCAST (no shuffle of the fact),
  *   - one key dominates the pair mass → SALT (the `q_skew_join`
  *     spread, a plan-level guarantee AQE's runtime split merely
  *     approximates),
  *   - otherwise → PLAIN keyed shuffle (Spark/AQE's default game)
  *
  * — then EXECUTES the chosen plan and reports decision + result in
  * one row. All three strategies produce the identical result set
  * (the salted join's contract), so one oracle gates every branch,
  * and the DECISION itself is reproduced in SQL (CASE over the same
  * pre-flight numbers) — a wrong branch choice hash-fails the gate.
  *
  * The pre-flight is a ONE-ROW driver read (the planner's own
  * bounded action — deciding a physical plan from key-table
  * statistics is exactly what a cost-based optimizer does); the
  * statistics themselves come from partial-agg shuffles down to
  * |keys| rows, never a fact-sized move.
  */
object JoinPlanner {

  /** Build sides up to this many rows broadcast (a row-count stand-in
    * for `spark.sql.autoBroadcastJoinThreshold`'s byte budget).
    */
  val BroadcastRowLimit = 1000L

  /** Salt when the hottest key carries more than this share of the
    * total pair mass.
    */
  val SkewShare = 0.2

  val SaltBuckets = 8

  private[graft] final case class Preflight(buildRows: Long,
      joinSize: Double, hotShare: Double) {
    def strategy: String =
      if (buildRows <= BroadcastRowLimit) "broadcast"
      else if (hotShare > SkewShare) "salt"
      else "plain"
  }

  /** The bounded pre-flight read from the two per-key count frames:
    * one row of key-table statistics.
    */
  private[graft] def preflightOf(ca: DataFrame, cb: DataFrame): Preflight = {
    val r = Stats.joinSizeFromCounts(ca, cb).head()
    // an input with no rows of either type aggregates to one all-NULL
    // row (sum over nothing): price the join at 0 instead of NPE-ing
    // on a null primitive read
    if (r.isNullAt(r.fieldIndex("n_keys_b"))) return Preflight(0L, 0.0, 0.0)
    val buildRows = r.getLong(r.fieldIndex("n_keys_b"))
    val js = r.getDouble(r.fieldIndex("join_size"))
    val hot = r.getDouble(r.fieldIndex("hot_contrib"))
    // degenerate guard: an empty join prices hot_share at 0 in both
    // engines (0/0 would NULL-vs-NaN diverge — the q_neyman_alloc
    // lesson)
    Preflight(buildRows, js, if (js > 0) hot / js else 0.0)
  }

  def joinPreflight(spark: SparkSession, sfDir: String): DataFrame =
    joinPreflightOver(Tables.events(spark, sfDir), "click", "purchase")

  /** Same operator over any (user_id, event_id, event_type, value)
    * frame — the decision-matrix specs plant each branch's workload.
    */
  def joinPreflightOver(events: DataFrame, typeA: String,
      typeB: String): DataFrame = {
    val spark = events.sparkSession
    val fact = events.filter(col("event_type") === typeA)
      .select(col("user_id"), col("event_id"),
        Relational.money(col("value")).as("v"))
    // ONE build-side aggregation: the persisted count frame prices
    // the pre-flight AND feeds the executed join — no second scan of
    // the fact for the same table
    val build = events.filter(col("event_type") === typeB)
      .groupBy("user_id").agg(count(lit(1)).as("cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ca = events.filter(col("event_type") === typeA)
      .groupBy("user_id").agg(count(lit(1)).as("ca"))
    val pre = preflightOf(ca, build)
    // deferred AFTER the preflight collect: the cached build side
    // still feeds the executed join below, then is reclaimed
    Scratch.defer(build)
    val joined = pre.strategy match {
      case "broadcast" => fact.join(broadcast(build), "user_id")
      case "salt" => Relational.saltedJoin(fact, build, "user_id",
        col("event_id"), SaltBuckets)
      case _ => fact.join(build, "user_id")
    }
    // the workload: every fact row weighted by its key's build-side
    // count — count, pair mass, and the decimal-exact weighted value
    val result = joined.agg(
      count(lit(1)).as("n_joined"),
      sum(col("cb")).as("total_pairs"),
      sum((col("v") * col("cb"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 2)))
        .cast("double").as("weighted_value"))
    result.select(
      lit(pre.strategy).as("strategy"),
      lit(pre.buildRows).as("build_rows"),
      round(lit(pre.hotShare), 9).as("hot_share"),
      col("n_joined"), col("total_pairs"), col("weighted_value"))
  }
}
