package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

class QualitySpec extends SparkSpec {

  test("expectations: clean-data checks pass, the planted-failing " +
      "quantity bound fails, and metrics are exact count ratios") {
    val rep = Quality.expectations(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getBoolean(4))).toMap
    assert(rep.size == 7)
    // synthetic data is referentially clean — these must be exactly 1.0
    for (c <- Seq("complete_text", "unique_o_orderkey",
        "accepted_o_orderstatus", "range_l_discount",
        "nonnull_value", "fk_lineitem_orders")) {
      assert(rep(c) == ((1.0, true)), s"$c -> ${rep(c)}")
    }
    // quantities span 1..50, so the ≤30 bound genuinely fails
    val (qm, qp) = rep("max_l_quantity_le_30")
    assert(!qp && qm > 0.0 && qm < 1.0, s"quantity metric $qm")
  }

  test("expectations plan: scan-local constraints fold into one " +
      "aggregate per table — five scans plus the one FK join") {
    val plan = Quality.expectations(spark, sf)
      .queryExecution.optimizedPlan
    val scans = plan.collectLeaves()
    // documents, orders, lineitem, events + (lineitem, orders) for FK
    // = 6 leaves; the point is it does NOT grow with the number of
    // constraints (7 checks, 6 leaves)
    assert(scans.size == 6, s"${scans.size} leaves")
  }

  test("snapshot diff classifies the modular drift exactly") {
    val diff = Quality.snapshotDiff(spark, sf)
      .groupBy("change").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = Tables.orders(spark, sf).count()
    val keys = Tables.orders(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0))
    // added: in v2 not v1 = k%5==0 && k%7!=0
    assert(diff("added") == keys.count(k => k % 5 == 0 && k % 7 != 0))
    assert(diff("removed") == keys.count(k => k % 5 != 0 && k % 7 == 0))
    // changed: in both && price bumped
    assert(diff("changed") ==
      keys.count(k => k % 5 != 0 && k % 7 != 0 && k % 3 == 0))
    // everything else is unchanged and therefore absent
    assert(diff.values.sum < n)
  }

  test("snapshot diff emits null old_price for added and null " +
      "new_price for removed rows") {
    val d = Quality.snapshotDiff(spark, sf)
    assert(d.filter(col("change") === "added" &&
      col("old_price").isNotNull).isEmpty)
    assert(d.filter(col("change") === "removed" &&
      col("new_price").isNotNull).isEmpty)
    assert(d.filter(col("change") === "changed" &&
      (col("old_price").isNull || col("new_price").isNull)).isEmpty)
  }

  test("readability: more terminal punctuation raises the score for " +
      "the same words, and counts match hand computation") {
    import spark.implicits._
    val probe = Seq(
      (1L, "The cat sat. The dog ran. All was well."),
      (2L, "The cat sat the dog ran all was well.")
    ).toDF("doc_id", "text")
    probe.createOrReplaceTempView("readability_probe")
    // same operator expression over a planted frame
    val words = greatest(size(filter(
      split(col("text"), "[^\\p{L}]+"), w => w =!= "")).cast("long"), lit(1L))
    val sentences = greatest(size(
      regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
      .cast("long"), lit(1L))
    val rows = probe.select(col("doc_id"), words.as("w"), sentences.as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1L) == ((9L, 3L)))
    assert(rows(2L) == ((9L, 1L)))
    // corpus run: schema + everyone scored
    val scored = graft.operators.TextAnalysis.readability(spark, sf)
    assert(scored.columns.toSeq ==
      Seq("doc_id", "n_words", "n_sentences", "n_syllables", "flesch"))
    assert(scored.filter(col("flesch").isNull).isEmpty)
  }

  test("mutual information: joint marginals are consistent and total " +
      "MI is non-negative up to output rounding") {
    val mi = graft.operators.Relational.mutualInfo(spark, sf).cache()
    val nOrders = Tables.orders(spark, sf).count()
    assert(mi.agg(sum("n_xy")).head.getLong(0) == nOrders)
    // MI = Σ mi_term ≥ 0 (Gibbs); each term is rounded to 1e-6
    val total = mi.agg(sum("mi_term")).head.getDouble(0)
    assert(total >= -1e-4, s"negative MI: $total")
    mi.unpersist()
  }

  test("group rare: the cap keeps exactly topK categories plus OTHER " +
      "and loses no rows") {
    val capped = graft.operators.Relational.groupRare(spark, sf).cache()
    val total = Tables.events(spark, sf).count()
    assert(capped.agg(sum("n")).head.getLong(0) == total)
    val cats = capped.select("category").collect().map(_.getString(0))
    assert(cats.length == 6 && cats.count(_ == "OTHER") == 1, cats.toSeq)
    // the fold is real: OTHER aggregates a nonempty tail
    assert(capped.filter(col("category") === "OTHER")
      .head.getLong(1) > 0)
    capped.unpersist()
  }

  test("yoy growth: every month with a year-ago sibling gets a ratio, " +
      "the first year never does") {
    val yoy = graft.operators.Relational.yoyGrowth(spark, sf).cache()
    val months = yoy.select("month").collect().map(_.getString(0)).sorted
    // the corpus emits a dense month series, so lag-12 is exactly
    // "every month except the first 12"
    val withPrev = yoy.filter(col("yoy").isNotNull).count()
    assert(withPrev == months.length - 12,
      s"$withPrev vs ${months.length - 12}")
    assert(yoy.filter(col("month") < months(12) &&
      col("yoy").isNotNull).isEmpty)
    yoy.unpersist()
  }

  test("gdpr erasure audit: before = deleted + after on every row and " +
      "the cascade counts match an independent replay") {
    val rep = Quality.gdprDelete(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rep.size == 3)
    rep.foreach { case (t, (before, del, after)) =>
      assert(before == del + after, s"$t audit does not balance")
    }
    // independent replay of the cascade
    val forget = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 97 === 0)
    assert(rep("customer")._2 == forget.count())
    val dead = Tables.orders(spark, sf).join(
      forget.select(col("c_custkey")),
      col("o_custkey") === col("c_custkey"), "left_semi")
    assert(rep("orders")._2 == dead.count())
    assert(rep("lineitem")._2 == Tables.lineitem(spark, sf).join(
      dead.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_semi").count())
    // the forget set is non-trivial at this SF
    assert(rep("customer")._2 > 0)
  }

  test("graph jaccard: every pair is wedge-connected, canonical a<b, " +
      "and scores match brute-force neighbor sets") {
    val jac = graft.operators.Dedup.graphJaccard(spark, sf).collect()
    assert(jac.nonEmpty)
    assert(jac.forall(r => r.getLong(0) < r.getLong(1)))
    // brute-force replay from the edge list
    val e = graft.operators.Dedup.ngramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (e ++ e.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    jac.foreach { r =>
      val (a, b, nc, j) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val inter = nbrs(a).intersect(nbrs(b)).size
      val union = nbrs(a).union(nbrs(b)).size
      assert(nc == inter, s"($a,$b) common $nc vs $inter")
      assert(math.abs(j - inter.toDouble / union) < 1e-6)
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("entity match: pairs equal the band-join replay, stay in-block, " +
      "and a planted twin pair is found") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val em = Quality.entityMatch(spark, sf).cache()
    assert(em.filter(col("dist") > 1).isEmpty)
    // independent replay: the same window ranking, but candidates from
    // a non-equi rank-band join instead of the exploded rank slots
    val byBlock = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))
      .orderBy(col("c_name"), col("c_custkey"))
    val ranked = Tables.customer(spark, sf)
      .withColumn("rn", row_number().over(byBlock).cast("long"))
    val replay = ranked.as("a").join(ranked.as("b"),
        col("a.c_nationkey") === col("b.c_nationkey")
          && col("a.c_mktsegment") === col("b.c_mktsegment")
          && col("b.rn") > col("a.rn") && col("b.rn") <= col("a.rn") + 3
          && levenshtein(col("a.c_name"), col("b.c_name")) <= 1)
      .select(col("a.c_nationkey").as("nationkey"),
        col("a.c_mktsegment").as("mktsegment"),
        col("a.c_custkey").as("a_key"), col("b.c_custkey").as("b_key"),
        levenshtein(col("a.c_name"), col("b.c_name")).as("dist"))
    assert(em.exceptAll(replay).isEmpty && replay.exceptAll(em).isEmpty)
    // planted twins: names one edit apart, same block, adjacent ranks
    val twins = Seq(
      (900000001L, "Acme Corp", 7, "BUILDING"),
      (900000002L, "Acme Corq", 7, "BUILDING"),
      (900000003L, "Zebra Ltd", 7, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    val found = Quality.entityMatchOver(twins, 3)
      .select("a_key", "b_key").collect()
    assert(found.toSeq.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((900000001L, 900000002L)))
  }

  test("compaction shrinks the file count without touching content") {
    val (small, big) = graft.operators.Layout.compactRun(spark, sf)
    assert(graft.operators.Layout.parquetFileCount(small) == 64)
    assert(graft.operators.Layout.parquetFileCount(big) <= 4)
    val a = spark.read.parquet(small)
    val b = spark.read.parquet(big)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("hot-block refinement: a planted 10k-row single block splits " +
      "into task-sized name-prefix blocks with the match set intact") {
    import spark.implicits._
    // one ultra-hot (nation, segment) block; names spread over the
    // [a-z] prefix space, twins one edit apart INSIDE their prefix
    // the doubled numeric suffix keeps every non-twin pair >= 2 edits
    // apart (distinct numbers differ in >= 1 digit, counted twice)
    val rows = (0 until 10000).map { i =>
      val prefix = ('a' + i % 26).toChar
      val n = i / 26
      (1000000L + i, s"$prefix-name-$n-$n", 7, "BUILDING")
    } ++ Seq(
      (2000001L, "m-twin-alpha", 7, "BUILDING"),
      (2000002L, "m-twin-alphb", 7, "BUILDING"))
    val hot = rows.toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    // unrefined: the whole corpus is ONE block (the 100 TB hazard)
    val flat = Quality.entityBlockSizes(hot, 0)
    assert(flat.count() == 1 &&
      flat.head().getLong(flat.head().fieldIndex("n")) == 10002L)
    // refined: every block is task-sized (<= ~1/26th of the hot block)
    val refined = Quality.entityBlockSizes(hot, 1)
    assert(refined.agg(max("n")).head().getLong(0) <= 500L)
    // the planted twins share a prefix, so the refined path still
    // finds exactly them -- and nothing else
    val found = Quality.entityMatchOver(hot, 3, namePrefix = 1)
      .select("a_key", "b_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(found == Seq((2000001L, 2000002L)))
    // prefix-stable corpora: refined output equals the unrefined one
    val base = Quality.entityMatchOver(hot, 3)
    val ref = Quality.entityMatchOver(hot, 3, namePrefix = 1)
    assert(ref.exceptAll(base).isEmpty && base.exceptAll(ref).isEmpty)
  }

  test("k-anonymity: class sizes tile the customer table, flags match " +
      "their thresholds, and no member of a small class hides") {
    val rep = Quality.kAnonymity(spark, sf).cache()
    val nCust = Tables.customer(spark, sf).count()
    assert(rep.agg(sum("class_size")).head().getLong(0) == nCust)
    assert(rep.filter(col("k_anonymous") =!= (col("class_size") >= 5)).isEmpty)
    assert(rep.filter(col("l_diverse") =!= (col("l_div") >= 3)).isEmpty)
    // l-diversity can never exceed the sensitive-domain size (5 TPC-H
    // priorities) nor, for a class of size s, s × orders-per-customer
    assert(rep.filter(col("l_div") > 5).isEmpty)
    // cross-check one class against a direct recount
    val r0 = rep.orderBy("nationkey", "segment", "bal_band").head()
    val direct = Tables.customer(spark, sf)
      .filter(col("c_nationkey") === r0.getLong(0)
        && col("c_mktsegment") === r0.getString(1)
        && floor(col("c_acctbal") / 1000).cast("long") === r0.getLong(2))
      .count()
    assert(direct == r0.getLong(3))
  }

  test("anon generalize: chosen level is adequate AND minimal, " +
      "suppression only when the coarsest class still fails k") {
    val k = 5
    val g = Quality.anonGeneralize(spark, sf, k = k).cache()
    assert(g.count() == Tables.customer(spark, sf).count())
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("segment"), col("c_acctbal"))
    // class size of record r at level l, recounted from scratch
    def sizesAt(l: Int) = cust
      .withColumn("b", floor(col("c_acctbal") / (1000.0 * (1 << l))).cast("long"))
      .groupBy("nationkey", "segment", "b").agg(count(lit(1)).as(s"n$l"))
    val joined = (0 to 3).foldLeft(
        g.join(cust, Seq("c_custkey", "nationkey", "segment"))) { (df, l) =>
      df.withColumn(s"b$l",
          floor(col("c_acctbal") / (1000.0 * (1 << l))).cast("long"))
        .join(sizesAt(l).withColumnRenamed("b", s"b$l"),
          Seq("nationkey", "segment", s"b$l"))
    }.cache()
    // adequacy: the class at the chosen level has >= k members; the
    // emitted gen_band IS that level's band
    for (l <- 0 to 3) {
      val at = joined.filter(col("level") === l)
      assert(at.filter(col(s"n$l") < k).isEmpty, s"level $l inadequate")
      assert(at.filter(col("gen_band") =!= col(s"b$l")).isEmpty)
      // minimality: every finer level failed k
      for (f <- 0 until l)
        assert(at.filter(col(s"n$f") >= k).isEmpty,
          s"level $l chosen but level $f already adequate")
    }
    // suppression: only when even the coarsest class fails
    val sup = joined.filter(col("suppressed"))
    assert(sup.filter(col("n3") >= k).isEmpty)
    assert(sup.filter(col("level") =!= -1L || col("gen_band") =!= -1L).isEmpty)
    joined.unpersist(); g.unpersist()
  }

  test("dp counts: one release row per group, noise within the Laplace " +
      "tail bound, and the pinned-seed release is reproducible") {
    val r = Quality.dpCounts(spark, sf).cache()
    val truth = Tables.documents(spark, sf)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"),
        sum(least(col("n_chars"), lit(1000L))).as("s"))
      .cache()
    assert(r.count() == truth.count())
    // max |Laplace(b)| under the 2^-32 inverse-CDF floor is b*32*ln(2)
    val j = r.join(truth, Seq("lang", "source"))
    val maxAbs = 32.0 * math.log(2.0)
    assert(j.filter(abs(col("n_dp") - col("n")) > 2.0 * maxAbs).isEmpty)
    assert(j.filter(
      abs(col("chars_dp") - col("s")) > 2000.0 * maxAbs).isEmpty)
    // pinned seed => bit-identical re-release
    assert(r.except(Quality.dpCounts(spark, sf)).isEmpty)
    r.unpersist(); truth.unpersist()
  }

  test("benford: single-digit corpus pins chi2/MAD against the literal " +
      "expectations, zero-count digits still emit, sub-1 rows drop") {
    import spark.implicits._
    // 10 rows leading with digit 1, plus two sub-1 rows that must be
    // excluded (their leading '0' is a scale artifact)
    val rows = (Seq.fill(10)(19.99) ++ Seq(0.5, 0.99)).toDF("v")
      .select(col("v").cast("decimal(18,2)").as("v"))
    val out = Quality.benfordOver(rows).collect()
      .map(r => r.getAs[Long]("digit") -> r).toMap
    assert(out.size == 9)
    assert(out(1L).getAs[Long]("n") == 10 &&
      out(1L).getAs[Double]("obs_p") == 1.0)
    (2L to 9L).foreach { d =>
      assert(out(d).getAs[Long]("n") == 0 &&
        out(d).getAs[Double]("obs_p") == 0.0)
    }
    // expected scalars recomputed with the operator's own rounding
    val exp = Quality.BenfordExp
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val chi2 = r6((1 to 9).map { d =>
      val e = 10.0 * exp(d - 1)
      val n = if (d == 1) 10.0 else 0.0
      BigDecimal(r6((n - e) * (n - e) / e))
    }.sum.toDouble)
    val mad = r6((1 to 9).map { d =>
      val n = if (d == 1) 1.0 else 0.0
      BigDecimal(r6(math.abs(n - exp(d - 1))))
    }.sum.toDouble / 9.0)
    assert(out(1L).getAs[Double]("chi2") == chi2)
    assert(out(1L).getAs[Double]("mad") == mad)
  }

  test("split orders: only multi-order (customer, day) groups surface, " +
      "with exact cents and the largest-single share") {
    import spark.implicits._
    val dir = TempDirs.create("graft_split").toString
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    Seq(
      (1L, 1L, 30.00, t("2024-03-01 09:00:00")),  // split day: 3 orders
      (2L, 1L, 50.00, t("2024-03-01 15:00:00")),
      (3L, 1L, 20.00, t("2024-03-01 18:00:00")),
      (4L, 1L, 99.00, t("2024-03-02 09:00:00")),  // singleton day
      (5L, 2L, 10.00, t("2024-03-01 09:00:00")))  // other cust singleton
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Quality.splitOrders(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getDate(1).toString == "2024-03-01")
    assert(r.getLong(2) == 3L && r.getLong(3) == 10000L
      && r.getLong(4) == 5000L)
    assert(r.getDouble(5) == 0.5)
  }

  test("anon sweep: suppression costs are monotone in k and agree with " +
      "a direct recount at k = 5") {
    val rows = Quality.anonSweep(spark, sf).orderBy("k").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 5L, 10L, 20L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(2) >= a.getLong(2), s"violating not monotone")
        assert(b.getLong(3) >= a.getLong(3), s"suppressed not monotone")
      case _ => ()
    }
    // k = 5 agrees with the fixed-k audit's violating classes
    val audit5 = Quality.kAnonymity(spark, sf, k = 5)
      .filter(!col("k_anonymous"))
    assert(rows(1).getLong(2) == audit5.count())
    assert(rows(1).getLong(3) ==
      audit5.agg(sum(col("class_size"))).head().getLong(0))
  }

  test("survivorship: golden records carry the cluster min id, the " +
      "longest member (ties to smaller id), and modal fields") {
    import graft.operators.Dedup
    val clusters = Dedup.clusters(spark, sf).cache()
    val out = Quality.survivorship(spark, sf).cache()
    // one golden record per multi-member cluster, none for singletons
    assert(out.count() == clusters.groupBy("cluster_id").count()
      .filter(col("count") > 1).count())
    assert(out.count() > 0, "vacuous at this SF — retarget the spec")
    val j = clusters.join(
      Tables.documents(spark, sf)
        .select("doc_id", "n_chars", "lang", "source"), "doc_id")
      .cache()
    val expect = j.groupBy("cluster_id")
      .agg(min("doc_id").as("c"), max("n_chars").as("m"),
        count(lit(1)).as("n"))
      .filter(col("n") > 1)
    assert(out.join(expect, "cluster_id")
      .filter(col("canonical_id") =!= col("c")
        || col("best_chars") =!= col("m")
        || col("n_members") =!= col("n")).isEmpty)
    // best_doc = smallest id among members at best_chars
    val bd = j.join(out.select("cluster_id", "best_chars", "best_doc"),
        "cluster_id")
      .filter(col("n_chars") === col("best_chars"))
      .groupBy("cluster_id", "best_doc")
      .agg(min("doc_id").as("want"))
    assert(bd.filter(col("best_doc") =!= col("want")).isEmpty)
    // the chosen lang/source attain the cluster's max member count
    for (f <- Seq("lang", "source")) {
      val cnt = j.groupBy(col("cluster_id"), col(f)).count()
      val mx = cnt.groupBy("cluster_id").agg(max("count").as("mc"))
      val chosen = out.select(col("cluster_id"), col(f))
        .join(cnt, Seq("cluster_id", f)).join(mx, "cluster_id")
      assert(chosen.filter(col("count") =!= col("mc")).isEmpty, f)
    }
    out.unpersist(); clusters.unpersist(); j.unpersist()
  }

  test("t-closeness: planted skewed classes pin the exact variational " +
      "distance and the uniform class passes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = TempDirs.create("graft_tclose").toString
    // three single-customer classes (distinct nations): A all-URGENT,
    // B all-LOW, C balanced; global = (3U, 3L) -> TVD .5/.5/0
    Seq((1L, 1, "SEG", 100.0), (2L, 2, "SEG", 100.0),
      (3L, 3, "SEG", 100.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 1L, "URGENT"), (2L, 1L, "URGENT"),
      (3L, 2L, "LOW"), (4L, 2L, "LOW"),
      (5L, 3L, "URGENT"), (6L, 3L, "LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.operators.Quality.tCloseness(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(4), r.getBoolean(5))))
      .toMap
    assert(out(1L) == ((0.5, false)), s"A = ${out(1L)}")
    assert(out(2L) == ((0.5, false)), s"B = ${out(2L)}")
    assert(out(3L) == ((0.0, true)), s"C = ${out(3L)}")
  }
}
