package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, WelfordAgg}
import graft.operators.AsOf

class FunctionsSpec extends SparkSpec {

  test("welford aggregator matches built-in avg/var_samp") {
    import spark.implicits._
    val got = SparkEntry.queries("agg_welford")(spark, sf)
    val want = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), avg("value").as("mean"),
        var_samp("value").as("variance"))
    val joined = got.as("g").join(want.as("w"), "event_type")
    val bad = joined.filter(
      abs(col("g.mean") - col("w.mean")) > 1e-9 ||
        abs(col("g.variance") - col("w.variance")) > 1e-9 ||
        col("g.n") =!= col("w.n"))
    assert(bad.isEmpty)
  }

  test("asof join: click is at-or-before purchase, and the latest one") {
    val a = AsOf.purchaseWithLastClick(spark, sf).cache()
    assert(a.count() ==
      Tables.events(spark, sf).filter(col("event_type") === "purchase").count())
    assert(a.filter(col("click_ts") > col("ts")).isEmpty)
  }

  test("last-touch attribution credits only in-window clicks and buckets " +
      "the rest as unattributed") {
    import spark.implicits._
    // epoch-anchored, NOT Timestamp.valueOf: the asserted day strings
    // are formatted in the session zone (UTC), so the planted instants
    // must be UTC too regardless of the JVM default zone
    val base = new java.sql.Timestamp(1705320000000L) // 2024-01-15T12:00:00Z
    def t(offSec: Long) = new java.sql.Timestamp(base.getTime + offSec * 1000)
    // u1: click 1d before → credited to its day; u2: click 8d before →
    // outside the 7-day window → unattributed; u3: no click at all →
    // unattributed; u4: click exactly 7d before → still credited
    // (inclusive bound)
    val planted = Seq(
      (1L, 1L, "click", t(-86400L), 0.0),
      (2L, 1L, "purchase", t(0), 10.0),
      (3L, 2L, "click", t(-8L * 86400), 0.0),
      (4L, 2L, "purchase", t(0), 20.0),
      (5L, 3L, "purchase", t(0), 40.0),
      (6L, 4L, "click", t(-7L * 86400), 0.0),
      (7L, 4L, "purchase", t(0), 80.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = AsOf.attributionLastTouchOver(planted).collect()
      .map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(Some("2024-01-14")) == ((1L, 10.0)))
    assert(got(Some("2024-01-08")) == ((1L, 80.0)))
    assert(got(None) == ((2L, 60.0)))
    // real corpus: purchase counts are conserved across buckets
    val real = AsOf.attributionLastTouch(spark, sf)
    assert(real.agg(sum("n_purchases")).head.getLong(0) ==
      Tables.events(spark, sf).filter(col("event_type") === "purchase").count())
  }

  test("shapley attribution: planted two-channel game pins the exact " +
      "values, post-purchase touches and unattributables are excluded, " +
      "and efficiency holds on the real corpus") {
    import spark.implicits._
    val base = new java.sql.Timestamp(1705320000000L)
    def t(offSec: Long) = new java.sql.Timestamp(base.getTime + offSec * 1000)
    // u1 {click}, u2 {view}, u3 {click,view} — all convert; u4
    // converts with NO prior touch (unattributable, excluded); u5
    // clicks but never converts (not in the game); u1's view AFTER
    // the purchase must not count
    val planted = Seq(
      (1L, 1L, "click", t(-100)), (2L, 1L, "purchase", t(0)),
      (3L, 1L, "view", t(50)),
      (4L, 2L, "view", t(-100)), (5L, 2L, "purchase", t(0)),
      (6L, 3L, "click", t(-100)), (7L, 3L, "view", t(-50)),
      (8L, 3L, "purchase", t(0)),
      (9L, 4L, "purchase", t(0)),
      (10L, 5L, "click", t(-100))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = AsOf.shapleyAttributionOver(planted).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // v({c})=1, v({v})=1, v({c,v})=3; φ_c·2! = (1−0) + (3−1) = 3
    assert(got == Map("click" -> ((3L, 1.5)), "view" -> ((3L, 1.5))))
    // real corpus: efficiency axiom — Σφ equals the converted-user
    // count v(N) exactly (integer numerators sum to v(N)·n!)
    val real = AsOf.shapleyAttribution(spark, sf).collect()
    val n = real.length
    def fact(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)
    val ev = Tables.events(spark, sf)
    val vFull = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("ts")).as("p_ts"))
      .join(ev.filter(col("event_type") =!= "purchase"), Seq("user_id"))
      .filter(col("ts") < col("p_ts"))
      .select("user_id").distinct().count()
    assert(real.map(_.getLong(1)).sum == vFull * fact(n))
  }

  test("pit features: strictly-before frame, same-instant id tie rule, " +
      "decimal prior value, day span") {
    import spark.implicits._
    val base = new java.sql.Timestamp(1704110400000L) // 2024-01-01T12:00Z
    def t(d: Long) = new java.sql.Timestamp(base.getTime + d * 86400000L)
    // u1: click d0 v10, view d0, click d1 v5, purchase d1 (SAME instant
    // as click id3 but larger id -> click counts), purchase d2,
    // purchase d4 at same instant as a LATER-id click (excluded)
    val planted = Seq(
      (1L, 1L, "click", t(0), 10.0),
      (2L, 1L, "view", t(0), 0.0),
      (3L, 1L, "click", t(1), 5.0),
      (4L, 1L, "purchase", t(1), 100.0),
      (5L, 1L, "purchase", t(2), 100.0),
      (6L, 1L, "purchase", t(4), 100.0),
      (7L, 1L, "click", t(4), 9.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = AsOf.pitFeaturesOver(planted).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(4L, 5L, 6L))
    assert(got(4L).getAs[Long]("n_prior") == 3)
    assert(got(4L).getAs[Long]("n_prior_clicks") == 2)
    assert(got(4L).getAs[Double]("v_prior_clicks") == 15.0)
    assert(got(4L).getAs[Long]("days_active") == 1)
    assert(got(5L).getAs[Long]("n_prior") == 4)
    assert(got(5L).getAs[Double]("v_prior_clicks") == 15.0)
    // purchase id6 precedes click id7 at the same instant: excluded
    assert(got(6L).getAs[Long]("n_prior") == 5)
    assert(got(6L).getAs[Long]("n_prior_clicks") == 2)
    assert(got(6L).getAs[Long]("days_active") == 4)
  }

  test("nearest-in-time join picks the closer side, breaks ties backward, " +
      "and nulls users with no clicks") {
    import spark.implicits._
    // u1: clicks 10s back and 5s ahead → fwd/5s; u2: equidistant 7s
    // both sides → tie goes back; u3: no clicks at all → nulls;
    // u4: only a backward click → back
    val base = java.sql.Timestamp.valueOf("2024-01-15 12:00:00")
    def t(offSec: Long) = new java.sql.Timestamp(base.getTime + offSec * 1000)
    val planted = Seq(
      (1L, 1L, "click", t(-10)), (2L, 1L, "purchase", t(0)), (3L, 1L, "click", t(5)),
      (4L, 2L, "click", t(-7)), (5L, 2L, "purchase", t(0)), (6L, 2L, "click", t(7)),
      (7L, 3L, "purchase", t(0)), (8L, 3L, "view", t(1)),
      (9L, 4L, "click", t(-3)), (10L, 4L, "purchase", t(0))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = AsOf.nearestClickOver(planted).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(2)), Option(r.getString(3))))).toMap
    assert(got(2L) == ((Some(5000000L), Some("fwd"))), s"u1=${got(2L)}")
    assert(got(5L) == ((Some(7000000L), Some("back"))), s"u2=${got(5L)}")
    assert(got(7L) == ((None, None)), s"u3=${got(7L)}")
    assert(got(10L) == ((Some(3000000L), Some("back"))), s"u4=${got(10L)}")
    // real corpus: one row per purchase, dist non-negative when present
    val real = AsOf.nearestClick(spark, sf).cache()
    assert(real.count() ==
      Tables.events(spark, sf).filter(col("event_type") === "purchase").count())
    assert(real.filter(col("dist_us") < 0).isEmpty)
  }

  test("pivot counts sum to total events per user") {
    val p = AsOf.eventPivot(spark, sf).cache()
    val totals = p.withColumn("tot",
      coalesce(col("click"), lit(0L)) + coalesce(col("view"), lit(0L))
        + coalesce(col("purchase"), lit(0L)) + coalesce(col("signup"), lit(0L))
        + coalesce(col("error"), lit(0L)))
    val want = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("want"))
    assert(totals.join(want, "user_id")
      .filter(col("tot") =!= col("want")).isEmpty)
  }

  test("count-min sketch never undercounts, even with forced collisions") {
    import graft.functions.CountMinSketch
    import graft.operators.TextMapReduce
    val words = Tables.documents(spark, sf)
      .select(explode(split(col("text"), TextMapReduce.WordSplit)).as("word"))
      .filter(col("word") =!= "")
    val exact = words.groupBy("word").agg(count(lit(1)).as("truth"))
    // width 8 << vocabulary → every cell collides; CMS must only ever
    // overcount, and by no more than the total stream size
    val sk = words.agg(CountMinSketch.count_min(col("word"), 4, 8).as("sk"))
    val est = exact.crossJoin(sk)
      .withColumn("est", CountMinSketch.cms_estimate(col("sk"), col("word"), 4, 8))
      .cache()
    assert(est.filter(col("est") < col("truth")).isEmpty,
      "CMS undercounted — impossible for a correct sketch")
    val total = words.count()
    assert(est.filter(col("est") > total).isEmpty)
    // and the wide regime is exact on this vocabulary
    val wide = exact.crossJoin(
        words.agg(CountMinSketch.count_min(col("word"), 4, 8192).as("sk")))
      .withColumn("est", CountMinSketch.cms_estimate(col("sk"), col("word"), 4, 8192))
    assert(wide.filter(col("est") =!= col("truth")).isEmpty)
  }

  test("KMV sample is identical under any partitioning (order-free merge)") {
    import graft.functions.KmvSample
    import graft.operators.TextMapReduce
    def sample(parts: Int) = Tables.documents(spark, sf)
      .select(col("lang"),
        explode(split(col("text"), TextMapReduce.WordSplit)).as("word"))
      .filter(col("word") =!= "")
      .repartition(parts)
      .groupBy("lang")
      .agg(KmvSample.kmv_sample(col("word"), 7).as("s"))
    val a = sample(1)
    val b = sample(23)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "sample depends on partitioning — merge is not order-free")
  }

  test("KLL sketch: exact regime equals linear-interpolation quantiles " +
      "under any partitioning") {
    import graft.functions.KllSketch
    import spark.implicits._
    // permutation of 0..999 → below k, no compaction ever fires
    val vals = (0 until 1000).map(i => ((i * 37) % 1000).toDouble)
    def qs(parts: Int) = vals.toDF("v").repartition(parts)
      .agg(KllSketch.kll_quantiles(col("v"), 8192, Seq(0.25, 0.5, 0.75)).as("q"))
      .head().getSeq[Double](0)
    // sorted values are exactly 0..999, so quantile_cont(p) = p*999
    val want = Seq(0.25, 0.5, 0.75).map(_ * 999)
    for (parts <- Seq(1, 13)) {
      val got = qs(parts)
      assert(got == want, s"parts=$parts got=$got want=$want")
    }
  }

  test("KLL sketch: compaction regime keeps rank error bounded") {
    import graft.functions.KllSketch
    import spark.implicits._
    val n = 100000
    // fixed permutation of 0..n−1 (48271 is coprime to 100000), so the
    // true normalized rank of value v is v/(n−1)
    val vals = (0 until n).map(i => ((i.toLong * 48271) % n).toDouble)
    val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val got = vals.toDF("v").repartition(8)
      .agg(KllSketch.kll_quantiles(col("v"), 128, probs).as("q"))
      .head().getSeq[Double](0)
    probs.zip(got).foreach { case (p, v) =>
      val err = math.abs(v / (n - 1) - p)
      info(f"p=$p est=$v%.1f rank-err=$err%.4f")
      assert(err <= 0.05, f"rank error $err%.4f exceeds 0.05 at p=$p (k=128, n=$n)")
    }
  }

  test("theta sketch: two-level rollup equals count(DISTINCT); " +
      "union is order-free") {
    import graft.functions.ThetaSketch._
    val events = Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        col("user_id").cast("string").as("uid"))
    def rollup(parts: Int) = events.repartition(parts)
      .groupBy("event_type", "day")
      .agg(theta_sketch(col("uid"), 65536).as("sk"))
      .groupBy("event_type")
      .agg(theta_union(col("sk"), 65536).as("sk"))
      .select(col("event_type"), theta_estimate(col("sk"), 65536).as("users"))
    val want = Tables.events(spark, sf).groupBy("event_type")
      .agg(countDistinct("user_id").as("users"))
    val got = rollup(4)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "sketch rollup diverged from exact count(DISTINCT) in the exact regime")
    // bottom-k union is a set operation — identical under any layout
    assert(rollup(1).exceptAll(rollup(17)).isEmpty)
  }

  test("theta sketch: saturated estimate stays within 3 standard errors") {
    import spark.implicits._
    import graft.functions.ThetaSketch._
    val n = 50000
    val k = 256
    val est = (0 until n).map(i => s"user_$i").toDF("uid")
      .repartition(8)
      .agg(theta_sketch(col("uid"), k).as("sk"))
      .select(theta_estimate(col("sk"), k).as("est"))
      .head().getLong(0)
    val rse = 1.0 / math.sqrt(k - 2) // KMV relative standard error
    val relErr = math.abs(est - n).toDouble / n
    info(f"theta k=$k over $n distinct: est=$est relErr=$relErr%.4f (3*RSE=${3 * rse}%.4f)")
    assert(relErr <= 3 * rse, f"estimate $est off by $relErr%.3f > 3·RSE")
  }

  test("theta intersection: exact below saturation, bounded error above") {
    import spark.implicits._
    import graft.functions.ThetaSketch._
    // two 50k-element sets sharing 20k elements
    val a = (0 until 50000).map(i => s"m_$i")
    val b = (30000 until 80000).map(i => s"m_$i")
    def sk(xs: Seq[String], k: Int) = xs.toDF("x").repartition(4)
      .agg(theta_sketch(col("x"), k).as("sk"))
    // exact regime: k above both cardinalities → exact 20000
    val exact = sk(a, 131072).crossJoin(sk(b, 131072).withColumnRenamed("sk", "sk2"))
      .select(theta_intersect(col("sk"), col("sk2"), 131072).as("n"))
      .head().getLong(0)
    assert(exact == 20000L, s"exact-regime intersection $exact != 20000")
    // saturated: k=1024 → relative error within ~3/sqrt(k) of truth
    val est = sk(a, 1024).crossJoin(sk(b, 1024).withColumnRenamed("sk", "sk2"))
      .select(theta_intersect(col("sk"), col("sk2"), 1024).as("n"))
      .head().getLong(0)
    val relErr = math.abs(est - 20000L).toDouble / 20000
    info(f"saturated theta intersect: est=$est relErr=$relErr%.4f")
    assert(relErr <= 0.15, f"intersection estimate $est off by $relErr%.3f")
  }

  test("theta sketch JOIN: per-group sketches self-joined give exact " +
      "pairwise overlap below saturation, bounded error above") {
    import spark.implicits._
    import graft.functions.ThetaSketch._
    // three overlapping groups: g0 = 0..20k, g1 = 10k..30k, g2 = 25k..45k
    // → overlaps (g0,g1)=10k, (g1,g2)=5k, (g0,g2)=0
    val rows = (0 until 20000).map(i => ("g0", s"u_$i")) ++
      (10000 until 30000).map(i => ("g1", s"u_$i")) ++
      (25000 until 45000).map(i => ("g2", s"u_$i"))
    val df = rows.toDF("g", "uid").repartition(8)
    def overlaps(k: Int): Map[(String, String), Long] = {
      val sk = df.groupBy("g").agg(theta_sketch(col("uid"), k).as("sk"))
      sk.as("a").join(sk.as("b"), col("a.g") < col("b.g"))
        .select(col("a.g"), col("b.g"),
          theta_intersect(col("a.sk"), col("b.sk"), k).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
    }
    val want = Map(("g0", "g1") -> 10000L, ("g1", "g2") -> 5000L,
      ("g0", "g2") -> 0L)
    // exact regime: k above every group size → the join IS exact,
    // including the all-pairs contract (zero-overlap pair present)
    assert(overlaps(65536) == want)
    // saturated regime: every pairwise estimate within 15% (≈3·RSE at
    // k=1024) of truth; the empty overlap stays near zero
    val est = overlaps(1024)
    assert(est.keySet == want.keySet, "sketch join lost a type pair")
    want.foreach { case (p, n) =>
      val e = est(p)
      if (n == 0L) assert(e <= 200L, s"phantom overlap $e for $p")
      else assert(math.abs(e - n).toDouble / n <= 0.15,
        s"pair $p estimate $e too far from $n")
    }
  }

  test("SQL-registered custom functions work end to end") {
    GraftFunctions.register(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_v")
    val r = spark.sql(
      """SELECT doc_id,
        |  simhash64(xxhash_array(split(text, ' '))) AS sh,
        |  size(word_ngrams(split(text, ' '), 3)) AS n_sh,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp
        |FROM docs_v""".stripMargin)
    val row = r.head()
    assert(row.getDouble(3) == 11.0)
    assert(r.count() == 500)
    // the sketch AGGREGATES are SQL-reachable too — the analyzer
    // wraps registered AggregateFunctions automatically
    // SQL's NATURAL spelling: array(0.25, 0.5, 0.75) parses as
    // DECIMAL literals — litDoubles must cast, not assume double
    val agg = spark.sql(
      """SELECT lang,
        |  kll_quantiles(CAST(n_chars AS DOUBLE), 8192, array(0.25, 0.5, 0.75)) AS qs,
        |  size(theta_sketch(CAST(doc_id AS STRING), 1024)) AS n_sk
        |FROM docs_v GROUP BY lang""".stripMargin).collect()
    assert(agg.nonEmpty)
    agg.foreach { a =>
      val qs = a.getSeq[Double](1)
      assert(qs.size == 3 && qs == qs.sorted)
      assert(a.getInt(2) > 0)
    }
    // non-numeric constant array must fail loudly at analysis
    val bad = intercept[Throwable](
      spark.sql("SELECT kll_quantiles(1.0d, 64, array('a'))"))
    val chain = Iterator.iterate(bad)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("NUMERIC array expected"), chain)
  }

  test("bloom filter: zero false negatives, measured FP rate, " +
      "partition-invariant merge") {
    import graft.functions.BloomFilter._
    val bits = 16384
    val k = 6
    val members = spark.range(1000)
      .select(concat(lit("member_"), col("id")).as("key"))
    val bloomDf = members.agg(bloom_filter(col("key"), bits, k).as("bf"))
    // merge is a bitwise OR → the sketch must be IDENTICAL under any
    // partitioning (the property that makes it a distributed aggregate)
    val bloom7 = members.repartition(7)
      .agg(bloom_filter(col("key"), bits, k).as("bf"))
    assert(bloomDf.head().getSeq[Long](0) == bloom7.head().getSeq[Long](0))
    // no false negatives — EVERY member must probe true
    val misses = members.crossJoin(broadcast(bloomDf))
      .filter(!bloom_might_contain(col("bf"), col("key"), bits, k))
      .count()
    assert(misses == 0, s"$misses members probed false — false negatives")
    // measured FP rate on 10k disjoint probes: theory gives
    // (1 - e^{-kn/m})^k ≈ 8e-4 at n=1000, m=16384, k=6
    val nonMembers = spark.range(10000)
      .select(concat(lit("outsider_"), col("id")).as("key"))
    val fps = nonMembers.crossJoin(broadcast(bloomDf))
      .filter(bloom_might_contain(col("bf"), col("key"), bits, k))
      .count()
    assert(fps.toDouble / 10000 < 0.01, s"FP rate ${fps / 10000.0}")
    // the SQL surface builds the same sketch
    graft.functions.GraftFunctions.register(spark)
    members.createOrReplaceTempView("bloom_members_v")
    val sqlBloom = spark.sql(
      s"SELECT bloom_filter(key, $bits, $k) AS bf FROM bloom_members_v")
    assert(sqlBloom.head().getSeq[Long](0) == bloomDf.head().getSeq[Long](0))
  }

  test("bloom-pruned join equals the plain semi join") {
    val pruned = graft.operators.Relational.bloomPrunedJoin(spark, sf)
    val cust = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val plain = Tables.orders(spark, sf)
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("theta estimate survives a degenerate k-th hash of Long.MinValue") {
    import graft.functions.ThetaSketch
    // all-MinValue sketch of size k: mapped θ is exactly 0.0 without
    // the quantum clamp — the estimator must stay total (no ANSI cast
    // failure) and return the documented finite cap
    val df = spark.range(1)
      .select(array_repeat(lit(Long.MinValue), 16).as("sk"))
    val est = df.select(ThetaSketch.theta_estimate(col("sk"), 16).as("e"))
      .head().getLong(0)
    assert(est == 4611686018427387904L) // 2^62 cap
    val inter = df.select(ThetaSketch.theta_intersect(
        col("sk"), col("sk"), 16).as("i"))
      .head().getLong(0)
    assert(inter >= 0 && inter <= 4611686018427387904L)
  }
}
