package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Statistical inference over event metrics — the uncertainty layer a
  * measurement pipeline needs once point estimates start driving
  * decisions (dataset ablations, A/B rollouts, drift alarms).
  *
  * Cross-engine discipline (both operators hash-gate vs DuckDB):
  * randomness is md5-derived (the one hash both engines compute
  * identically), moment sums are exact DECIMAL, and every IEEE-double
  * step (division, sqrt) runs on identical exact inputs so the result
  * is bit-identical; outputs round to fixed places before the gate.
  */
object Stats {

  private def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Poisson(1) CDF cut points at 48-bit fixed point:
    * T(k) = floor(P(X<=k) * 2^48), k = 0..6. A 48-bit md5-uniform h
    * maps to bootstrap weight w = #{k : h >= T(k)} (so P(w=0) = e^-1,
    * P(w<=1) = 2e^-1, ..., capped at 7) — the standard Poisson
    * approximation to multinomial resampling, made DETERMINISTIC and
    * engine-portable: both engines compare the same integer hash to
    * the same integer literals, so replicate membership is identical
    * everywhere. Constants precomputed at 60-digit precision.
    */
  private[graft] val PoissonCdf48: Seq[Long] = Seq(
    103548857136060L, 207097714272121L, 258872142840152L,
    276130285696162L, 280444821410164L, 281307728552965L,
    281451546410098L)

  /** BOOTSTRAP CONFIDENCE INTERVALS for the per-event-type mean value
    * — R = 64 deterministic Poisson bootstrap replicates.
    *
    * Each (event, replicate) draws weight w ~ Poisson(1) from an
    * md5-uniform (see [[PoissonCdf48]]); replicate means are exact
    * DECIMAL weighted sums divided once in double and rounded to 9
    * places; the CI is the [2nd, 63rd] ORDER STATISTIC of the 64
    * sorted replicate means (≈ the 2.5%/97.5% percentile bootstrap —
    * element selection, never interpolation, so both engines pick the
    * same value bit-for-bit).
    *
    * Scale shape: the replicate fan-out is a map-side
    * `explode(sequence(0,63))` — 64× rows into a PARTIAL aggregation
    * keyed (event_type, r), so shuffle rows = types × 64 × partitions
    * regardless of corpus size; the order-statistic step handles 64
    * values per type. No global sort, no per-replicate scan — ONE scan
    * total vs the naive R re-scans.
    */
  def bootstrapCi(spark: SparkSession, sfDir: String, reps: Int = 64)
      : DataFrame =
    bootstrapCiOver(Tables.events(spark, sfDir), reps)

  /** Same operator over any (event_id, event_type, value) frame —
    * planted-weight specs pin the Poisson mapping and coverage.
    *
    * The POINT estimate rides the same fan-out as replicate r = −1
    * with weight 1, so ONE grouped aggregate (one corpus scan, one
    * exchange — reused by both output branches) produces the point
    * mean and all replicate means together.
    */
  def bootstrapCiOver(events: DataFrame, reps: Int): DataFrame = {
    val ev = events.select(col("event_id"), col("event_type"),
      money(col("value")).as("v"))
    val h = conv(substring(md5(concat(lit("boot"), col("r").cast("string"),
      lit("_"), col("event_id").cast("string"))), 1, 12), 16, 10)
      .cast("long")
    val pois = PoissonCdf48
      .map(t => (col("h") >= t).cast("int"))
      .reduce(_ + _)
    val agg = ev
      .withColumn("r", explode(sequence(lit(-1), lit(reps - 1))))
      .withColumn("h", h)
      .withColumn("w", when(col("r") === -1, lit(1)).otherwise(pois))
      .groupBy("event_type", "r")
      .agg(sum(col("w") * col("v")).as("swv"), sum(col("w")).as("sw"))
      .select(col("event_type"), col("r"), col("sw"),
        round(col("swv").cast("double") / col("sw"), 9).as("m"))
    // conditional aggregation folds the point row and the 64 replicate
    // rows into ONE grouped pass — no second branch, no join, so the
    // corpus is structurally scanned exactly once (collect_list skips
    // the nulls the `when` leaves on the other side)
    agg.groupBy("event_type")
      .agg(
        max(when(col("r") === -1, col("sw"))).as("n"),
        max(when(col("r") === -1, col("m"))).as("mean"),
        sort_array(collect_list(when(col("r") >= 0, col("m")))).as("ms"))
      .select(col("event_type"), col("n"), col("mean"),
        element_at(col("ms"), 2).as("ci_lo"),
        element_at(col("ms"), reps - 1).as("ci_hi"))
  }

  /** WELCH'S t-TEST between the mean `value` of two event types —
    * the unequal-variance two-sample test (the honest default when
    * group sizes and variances differ, as event metrics always do).
    *
    * All moments (n, Σx, Σx²) are EXACT decimal sums from one
    * partial-aggregated scan; mean/variance/t/df are then a fixed
    * dag of IEEE double ops on identical inputs in both engines
    * (divide, multiply, sqrt — each correctly rounded, so
    * bit-identical), rounded to 6 places at the gate. df is
    * Welch–Satterthwaite. At 100 TB this is the same one-scan
    * partial-agg shape — test statistics are free once the moment
    * sums exist (the `q_regression` recipe).
    */
  def abTest(spark: SparkSession, sfDir: String,
      typeA: String = "purchase", typeB: String = "click"): DataFrame =
    abTestOver(Tables.events(spark, sfDir), typeA, typeB)

  /** Same operator over any (event_type, value) frame — a
    * known-answer spec pins the t/df arithmetic.
    */
  def abTestOver(events: DataFrame, typeA: String, typeB: String)
      : DataFrame = {
    val m = events
      .filter(col("event_type").isin(typeA, typeB))
      .select(col("event_type"), money(col("value")).as("v"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum((col("v") * col("v")).cast(DecimalType(38, 4))).as("ss"))
      .select(col("event_type"), col("n").cast("double").as("n"),
        col("s").cast("double").as("s"), col("ss").cast("double").as("ss"))
    val a = m.filter(col("event_type") === typeA)
      .select(col("n").as("na"), col("s").as("sa"), col("ss").as("ssa"))
    val b = m.filter(col("event_type") === typeB)
      .select(col("n").as("nb"), col("s").as("sb"), col("ss").as("ssb"))
    // 1-row × 1-row: the cross join is a broadcast of a single row
    a.crossJoin(broadcast(b))
      .withColumn("ma", col("sa") / col("na"))
      .withColumn("mb", col("sb") / col("nb"))
      .withColumn("va",
        (col("ssa") - col("na") * col("ma") * col("ma")) / (col("na") - 1))
      .withColumn("vb",
        (col("ssb") - col("nb") * col("mb") * col("mb")) / (col("nb") - 1))
      .withColumn("sea", col("va") / col("na"))
      .withColumn("seb", col("vb") / col("nb"))
      .withColumn("t",
        (col("ma") - col("mb")) / sqrt(col("sea") + col("seb")))
      .withColumn("df",
        ((col("sea") + col("seb")) * (col("sea") + col("seb"))) /
          (col("sea") * col("sea") / (col("na") - 1) +
           col("seb") * col("seb") / (col("nb") - 1)))
      .select(
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        round(col("ma"), 6).as("mean_a"), round(col("mb"), 6).as("mean_b"),
        round(col("t"), 6).as("t_stat"), round(col("df"), 6).as("df"))
  }
}
