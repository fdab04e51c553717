package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (point-in-time) join — an operator Spark's DataFrame API
  * lacks. Composed from built-ins (preference (a) of the extension
  * ladder): tag both sides, union, and take the last right-side row at
  * or before each left timestamp with an ordered window — one shuffle
  * on (key), no range explosion, skew bounded by per-key event counts.
  *
  * Equivalent to DuckDB's `ASOF LEFT JOIN ... ON l.key = r.key AND
  * l.ts >= r.ts` (inclusive), which is exactly what the oracle runs.
  */
object AsOf {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** For every purchase event: the user's most recent click at or
    * before it (null if none yet).
    */
  def purchaseWithLastClick(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("t"), lit(0).as("side"),
        col("event_id"),
        col("event_id").as("p_click_id"), col("ts").as("p_click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("t"), lit(1).as("side"),
        col("event_id"),
        lit(null).cast("long").as("p_click_id"),
        lit(null).cast("timestamp").as("p_click_ts"))
    // side=0 sorts before side=1 at equal t → same-instant click counts
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    clicks.unionAll(purchases)
      .withColumn("click_id", last(col("p_click_id"), ignoreNulls = true).over(w))
      .withColumn("click_ts", last(col("p_click_ts"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"),
        date_format(col("t"), TsFmt).as("ts"),
        col("click_id"),
        date_format(col("click_ts"), TsFmt).as("click_ts"))
  }

  /** LAST-TOUCH ATTRIBUTION — the marketing-analytics composition of
    * the as-of join: every purchase is credited to the same user's
    * most recent click at-or-before it, but only if that click falls
    * inside a 7-day lookback window; purchases with no in-window
    * click land in the `null`-day "unattributed" bucket. Output is
    * the report grain: per credited click DAY, attributed purchase
    * count and attributed revenue.
    *
    * Scale shape: identical to [[purchaseWithLastClick]] — one
    * user-keyed shuffle for the ordered window (no join, no range
    * explosion), then one partial-aggregating shuffle whose row count
    * is days × partitions. The 7-day bound is a post-window filter,
    * exact to the microsecond on both engines (interval arithmetic on
    * µs longs, no calendar ambiguity at day granularity).
    */
  def attributionLastTouch(spark: SparkSession, sfDir: String): DataFrame =
    attributionLastTouchOver(Tables.events(spark, sfDir))

  /** Same operator over any (event_id, user_id, event_type, ts,
    * value) frame — planted window-edge specs pin the crediting rule.
    */
  def attributionLastTouchOver(events: DataFrame): DataFrame = {
    val ev = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        (col("event_type") === "purchase").cast("int").as("side"),
        when(col("event_type") === "click", col("ts")).as("c_ts"))
    // clicks (side=0) sort before purchases at equal ts → same-instant
    // click counts, matching purchaseWithLastClick's inclusive rule
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ev
      .withColumn("click_ts", last(col("c_ts"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .withColumn("day",
        when(col("click_ts").isNotNull &&
            col("click_ts") >= col("ts") - expr("INTERVAL 7 DAYS"),
          date_format(col("click_ts"), "yyyy-MM-dd")))
      .groupBy("day")
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("attributed_value"))
  }

  /** SHAPLEY channel attribution (`q_shapley_attribution`) —
    * completes the attribution trio beside last-touch
    * ([[attributionLastTouchOver]]) and the Markov removal-effect
    * model: each converted user's credit splits over the channel
    * types they touched STRICTLY BEFORE their first purchase, by the
    * exact Shapley value of the coalition game
    * v(S) = |{converted users whose channel set ⊆ S}|.
    *
    * Exactness discipline: channel sets are ≤ 2^n for n = distinct
    * pre-purchase channel types (4 here), so after ONE user-keyed
    * window pass + ONE bounded aggregation (≤ 2^n rows — the same
    * bounded-driver-materialization budget as the #types² Markov
    * matrix), the Shapley sum φ_i·n! = Σ_S |S|!(n−1−|S|)!·[v(S∪i) −
    * v(S)] is computed in INTEGER arithmetic; the only double is the
    * final φ = num/n!, derived identically in both engines from the
    * same integers. Users who purchase with no prior channel touch
    * are unattributable and excluded (the deterministic rule the
    * oracle mirrors).
    */
  def shapleyAttribution(spark: SparkSession, sfDir: String): DataFrame =
    shapleyAttributionOver(Tables.events(spark, sfDir))

  def shapleyAttributionOver(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    val ev = events.select(col("user_id"), col("ts"), col("event_type"))
    val firstPurchase = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("ts")).as("p_ts"))
    // one user-keyed shuffle: the sorted distinct channel set strictly
    // before the first purchase, then ≤ 2^n exact-set counts
    val sets = ev.filter(col("event_type") =!= "purchase")
      .join(firstPurchase, "user_id")
      .filter(col("ts") < col("p_ts"))
      .groupBy("user_id")
      .agg(array_sort(collect_set(col("event_type"))).as("chans"))
      .groupBy(concat_ws(",", col("chans")).as("set_key"))
      .agg(count(lit(1)).as("cnt"))
    // bounded driver read: at most 2^n exact coalition rows
    val exact = sets.collect()
      .map(r => r.getString(0).split(",").toSeq -> r.getLong(1)).toMap
    val channels = exact.keys.flatten.toSeq.distinct.sorted
    val n = channels.size
    val idx = channels.zipWithIndex.toMap
    val exactMask: Map[Int, Long] = exact.toSeq
      .map { case (chans, c) => chans.map(idx).map(1 << _).sum -> c }
      .groupBy(_._1).map { case (m, xs) => m -> xs.map(_._2).sum }
    def v(mask: Int): Long = exactMask.iterator
      .collect { case (m, c) if (m & mask) == m => c }.sum
    def fact(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)
    val rows = channels.map { ch =>
      val i = idx(ch)
      val num = (0 until (1 << n)).iterator
        .filter(mask => (mask & (1 << i)) == 0)
        .map { mask =>
          val s = Integer.bitCount(mask)
          fact(s) * fact(n - 1 - s) * (v(mask | (1 << i)) - v(mask))
        }.sum
      (ch, num)
    }
    import spark.implicits._
    rows.toDF("channel", "shapley_num")
      .select(col("channel"), col("shapley_num"),
        round(col("shapley_num").cast("double") / lit(fact(n).toDouble), 6)
          .as("shapley"))
  }

  /** POINT-IN-TIME FEATURE BACKFILL — the feature-store pattern
    * behind every training-set join ("the model may only see what
    * existed at prediction time"): for each purchase, the user's
    * trailing activity features STRICTLY BEFORE that instant
    * (prior-event count, prior-click count and value, days since
    * first activity). Leakage-free by construction: the frame ends
    * at row −1 of the (ts, event_id)-ordered user window.
    *
    * The [[attributionLastTouchOver]] shape generalized from "last
    * prior click" to running AGGREGATES: ONE user-keyed window pass,
    * NO join at all — where a naive backfill runs a per-purchase
    * range join (quadratic on active users), this is a single
    * shuffle + sorted scan at any scale. Prior value accumulates in
    * DECIMAL inside the deterministic sorted frame.
    */
  def pitFeatures(spark: SparkSession, sfDir: String): DataFrame =
    pitFeaturesOver(Tables.events(spark, sfDir))

  /** Same backfill over any (event_id, user_id, event_type, ts,
    * value) frame — a planted timeline pins the strictly-before
    * boundary and the same-instant tie rule. */
  def pitFeaturesOver(events: DataFrame): DataFrame = {
    val pre = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy(col("user_id"))
    events
      .withColumn("n_prior", count(lit(1)).over(pre))
      .withColumn("n_prior_clicks",
        count(when(col("event_type") === "click", 1)).over(pre))
      .withColumn("v_prior_clicks",
        coalesce(sum(when(col("event_type") === "click",
          col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))))
          .over(pre).cast("double"), lit(0.0)))
      .withColumn("days_active",
        datediff(to_date(col("ts")), to_date(min(col("ts")).over(all)))
          .cast("long"))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("n_prior"),
        col("n_prior_clicks"), col("v_prior_clicks"), col("days_active"))
  }

  /** Per-user event-type pivot (counts), fixed column set. */
  def eventPivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))

  /** Point-in-interval range join WITHOUT an equi key — the shape
    * Spark otherwise plans as a broadcast nested loop over all
    * (point, interval) pairs. Scale path: bucketize time at `slotSec`
    * granularity; each interval explodes to the slots it covers
    * (bounded by length/slotSec rows per interval), each point maps to
    * exactly ONE slot, and the join becomes an equi-join on the slot
    * key plus the exact containment filter. The shuffle is keyed and
    * linear in |points| + |interval-slots|; a point matches an
    * interval at most once because its single slot appears once per
    * interval.
    *
    * Containment is `start <= ts < end` (half-open, the window
    * convention everywhere else in this engine).
    */
  def rangeJoinBucketed(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      slotSec: Long): DataFrame = {
    val slotted = intervals.withColumn("slot",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / slotSec).cast("long"),
        floor(unix_timestamp(col(endCol)) / slotSec).cast("long"))))
    points
      .withColumn("slot",
        floor(unix_timestamp(col(tsCol)) / slotSec).cast("long"))
      .join(slotted, "slot")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("slot")
  }

  /** NEAREST-in-time join (the bidirectional as-of): for every
    * purchase, the same user's click nearest by absolute time —
    * backward OR forward — with ties broken toward the backward
    * (causal) side. The sensor-alignment primitive `ASOF` alone can't
    * express.
    *
    * Composition: one union, one ordered window per user carrying the
    * last click at-or-before (clicks sort before purchases at equal
    * timestamps, so backward is inclusive) and the first click
    * strictly after (rows-following window — equal-ts clicks sorted
    * BEFORE the purchase, so the following frame is strictly later).
    * One shuffle on user_id, no join, no range explosion — the
    * [[purchaseWithLastClick]] scale shape with a second frame.
    * Distances are exact epoch-microsecond longs: no float, no
    * truncation mismatch between engines.
    */
  def nearestClick(spark: SparkSession, sfDir: String): DataFrame =
    nearestClickOver(Tables.events(spark, sfDir))

  /** Same operator over any (event_id, user_id, event_type, ts) frame
    * — planted tie/one-sided/no-click specs pin the selection rule.
    */
  def nearestClickOver(events: DataFrame): DataFrame = {
    val ev = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("us"),
        (col("event_type") === "click").cast("int").as("is_click"))
    val order = Seq(col("us"), col("is_click").desc, col("event_id"))
    val wB = Window.partitionBy(col("user_id")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = Window.partitionBy(col("user_id")).orderBy(order: _*)
      .rowsBetween(1, Window.unboundedFollowing)
    val clickUs = when(col("is_click") === 1, col("us"))
    ev
      .withColumn("bus", last(clickUs, ignoreNulls = true).over(wB))
      .withColumn("fus", first(clickUs, ignoreNulls = true).over(wF))
      .filter(col("is_click") === 0)
      .withColumn("db", col("us") - col("bus"))
      .withColumn("df", col("fus") - col("us"))
      .select(col("event_id"), col("user_id"),
        when(col("db").isNotNull && (col("df").isNull || col("db") <= col("df")),
            col("db"))
          .otherwise(col("df")).as("dist_us"),
        when(col("db").isNotNull && (col("df").isNull || col("db") <= col("df")),
            lit("back"))
          .when(col("df").isNotNull, lit("fwd"))
          .otherwise(lit(null).cast("string")).as("side"))
  }
}
