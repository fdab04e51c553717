package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Data-quality operators: a declarative constraint report
  * (Deequ-style expectations) and a snapshot diff (CDC derive).
  *
  * Reference scope: the reference engine's pipelines assume their
  * inputs are well-formed text files (MapReduce_MIT
  * src/main/wc.go:22 tokenizes raw file contents unchecked); a 100 TB corpus
  * cannot — ingestion needs machine-checkable contracts and change
  * capture between ingest snapshots. Both operators are pure
  * aggregate/join compositions so Catalyst keeps them scan-local.
  */
object Quality {

  private def frac(pred: Column): Column =
    (sum(when(pred, 1L).otherwise(0L)).cast("double") /
      count(lit(1)).cast("double"))

  /** Constraint report over the star schema: one row per declared
    * expectation with its measured metric, threshold, and verdict.
    *
    * Scale design: every scan-local constraint on a table folds into
    * ONE aggregate over ONE scan of that table (conditional
    * aggregation — adding a constraint adds a column, not a pass).
    * The only multi-table check, referential integrity, is a single
    * left-anti join on the key; AQE sizes it at runtime. The result
    * is O(#constraints) rows regardless of corpus size, so the report
    * itself never becomes data.
    */
  def expectations(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val events = Tables.events(spark, sfDir)

    def report(name: String, tbl: String, metric: Column,
               threshold: Double): Column =
      struct(lit(name).as("check_name"), lit(tbl).as("tbl"),
        metric.as("metric"), lit(threshold).as("threshold"))

    // one aggregate = one scan per table, all its constraints inside
    val docRep = docs.agg(array(
      report("complete_text", "documents",
        frac(col("text").isNotNull && col("text") =!= ""), 1.0)).as("r"))
    val ordRep = orders.agg(array(
      report("unique_o_orderkey", "orders",
        countDistinct(col("o_orderkey")).cast("double") /
          count(lit(1)).cast("double"), 1.0),
      report("accepted_o_orderstatus", "orders",
        frac(col("o_orderstatus").isin("O", "F", "P")), 1.0)).as("r"))
    val liRep = li.agg(array(
      report("range_l_discount", "lineitem",
        frac(col("l_discount") >= 0.0 && col("l_discount") <= 0.1), 1.0),
      report("max_l_quantity_le_30", "lineitem",
        frac(col("l_quantity") <= 30.0), 1.0)).as("r"))
    val evRep = events.agg(array(
      report("nonnull_value", "events",
        frac(col("value").isNotNull), 1.0)).as("r"))
    // referential integrity in ONE lineitem pass: left-join the order
    // keys and count matches vs rows (the gdprDelete audit shape) —
    // no separate anti join + bare-count scans
    val fkRep = li.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(lit(1)).as("n_li"), count(col("o_orderkey")).as("n_ok"))
      .select(array(
        report("fk_lineitem_orders", "lineitem",
          col("n_ok").cast("double") / col("n_li").cast("double"), 1.0))
        .as("r"))

    Seq(docRep, ordRep, liRep, evRep, fkRep)
      .reduce(_.unionAll(_))
      .select(explode(col("r")).as("c"))
      .select(col("c.check_name"), col("c.tbl"),
        col("c.metric"), col("c.threshold"),
        (col("c.metric") >= col("c.threshold")).as("pass"))
  }

  /** Snapshot diff (CDC derive): given two versions of the orders
    * table, emit the change set — added / removed / changed rows —
    * as one full-outer join on the key. The complement of
    * q_merge_upsert (which APPLIES a change set): together they close
    * the capture→apply CDC loop.
    *
    * Versions are derived deterministically from the base table so
    * both engines construct identical inputs: v1 drops keys ≡0 mod 5,
    * v2 drops keys ≡0 mod 7 and bumps the price of keys ≡0 mod 3 by
    * 10.00 (decimal — exact on both engines).
    *
    * Scale design: ONE shuffle on the join key; unchanged rows are
    * filtered out post-join so output is proportional to the drift,
    * not the table. At 100 TB both sides would be bucketed on the key
    * (q_bucketed_join's layout) making the diff exchange-free.
    */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.orders(spark, sfDir)
    def money(c: Column): Column = c.cast("decimal(18,2)")
    val v1 = base.filter(col("o_orderkey") % 5 =!= 0)
      .select(col("o_orderkey").as("k1"),
        money(col("o_totalprice")).as("p1"))
    val v2 = base.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("k2"),
        when(col("o_orderkey") % 3 === 0,
          money(col("o_totalprice")) + lit(BigDecimal("10.00")))
          .otherwise(money(col("o_totalprice"))).as("p2"))
    v1.join(v2, col("k1") === col("k2"), "full_outer")
      .filter(col("k1").isNull || col("k2").isNull || col("p1") =!= col("p2"))
      .select(
        coalesce(col("k1"), col("k2")).as("o_orderkey"),
        when(col("k1").isNull, "added")
          .when(col("k2").isNull, "removed")
          .otherwise("changed").as("change"),
        col("p1").cast("double").as("old_price"),
        col("p2").cast("double").as("new_price"))
  }

  /** Sorted-neighborhood entity resolution over the customer master —
    * the blocked pairwise-match step every master-data/record-linkage
    * pipeline runs before survivorship. Candidates are generated the
    * scale-safe way: block on (c_nationkey, c_mktsegment), rank each
    * block by (c_name, c_custkey), and compare ONLY rows within `w`
    * rank positions of each other — the sorted-neighborhood method's
    * O(n·w) candidate set, never the O(n²) block self-join. The rank
    * gap is realized as an EQUI-join: each row explodes its next `w`
    * rank slots and joins (block, rank) — no non-equi band join, and
    * the shuffle key is the block + rank pair, so AQE can split a hot
    * block. Match = edit distance ≤ 1 between names (both engines
    * implement classic Levenshtein). Per-block ranking is one window
    * sort per block; blocks here are bounded by construction
    * (nation × segment). At 100 TB the block key gains a NAME-PREFIX
    * component (`namePrefix` > 0) to keep every block task-sized —
    * the hot-block refinement, wired below and pinned by a planted
    * 10k-row single-block spec; the candidate arithmetic is
    * unchanged, and the declared trade is that matches whose names
    * diverge inside the first `namePrefix` characters fall outside
    * the refined blocks (prefix-stable twins are unaffected).
    */
  def entityMatch(spark: SparkSession, sfDir: String, w: Int = 3): DataFrame =
    entityMatchOver(Tables.customer(spark, sfDir), w)

  /** Same operator over any customer-shaped frame — planted-twin
    * specs pin the match semantics; `namePrefix` > 0 adds the first
    * `namePrefix` name characters to the block key (the 100 TB
    * hot-block refinement).
    */
  def entityMatchOver(customers: DataFrame, w: Int,
      namePrefix: Int = 0): DataFrame = {
    val blk =
      if (namePrefix > 0) substring(col("c_name"), 1, namePrefix)
      else lit("")
    val c = customers
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_mktsegment"))
      .withColumn("blk", blk)
    val byBlock = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey"), col("c_mktsegment"), col("blk"))
      .orderBy(col("c_name"), col("c_custkey"))
    val ranked = c.withColumn("rn", row_number().over(byBlock).cast("long"))
    val probes = ranked.select(col("c_nationkey"), col("c_mktsegment"),
      col("blk"),
      col("c_custkey").as("a_key"), col("c_name").as("a_name"),
      explode(sequence(col("rn") + 1, col("rn") + w)).as("rn2"))
    probes
      .join(ranked.select(col("c_nationkey"), col("c_mktsegment"),
        col("blk"),
        col("c_custkey").as("b_key"), col("c_name").as("b_name"),
        col("rn").as("rn2")),
        Seq("c_nationkey", "c_mktsegment", "blk", "rn2"))
      // compute the O(|a|·|b|) DP once per candidate — Spark does not
      // share subexpressions across a Filter and its parent Project
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= 1)
      .select(col("c_nationkey").as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        col("a_key"), col("b_key"), col("dist"))
  }

  /** The refined-block SIZES the hot-block spec pins: rows per
    * (nation, segment, name-prefix) block.
    */
  private[graft] def entityBlockSizes(customers: DataFrame,
      namePrefix: Int): DataFrame =
    customers
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        substring(col("c_name"), 1, namePrefix).as("blk"))
      .agg(count(lit(1)).as("n"))

  /** Right-to-be-forgotten ERASURE with FK cascade + audit — the
    * compliance operator every long-lived corpus eventually needs:
    * a deterministic forget-set of customers (custkey ≡ 0 mod 97)
    * erases from `customer`, CASCADES through their `orders`, and
    * through those orders' `lineitem` rows; the output is the audit
    * report regulators actually ask for (per-table before/deleted/
    * after, where before = deleted + after by construction).
    *
    * Scale shape: the forget set is a tiny broadcast; each cascade
    * level is ONE anti/semi join on its key (customer→orders on
    * custkey, orders→lineitem on orderkey) — no row ever visits more
    * than its own table's shuffle, and the report aggregates are
    * scan-local counts. Erased BYTES disappear via the rewrite
    * (`q_compact_files`' move-bytes machinery); this op is the
    * row-selection + audit half.
    */
  def gdprDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val forget = cust.filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey"))
    val deadOrders = orders.join(broadcast(forget),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"))
    // fully declarative audit: left-join the (broadcast) kill sets and
    // count the matches — one plan, no driver-side scalar actions
    def audit(name: String, marked: DataFrame, markCol: Column): DataFrame =
      marked.agg(count(lit(1)).as("n_before"),
          count(markCol).as("n_deleted"))
        .select(lit(name).as("tbl"), col("n_before"), col("n_deleted"),
          (col("n_before") - col("n_deleted")).as("n_after"))
    audit("customer", cust,
        when(col("c_custkey") % 97 === 0, lit(1)))
      .unionAll(audit("orders",
        orders.join(broadcast(forget),
          col("o_custkey") === col("c_custkey"), "left"),
        col("c_custkey")))
      .unionAll(audit("lineitem",
        li.join(broadcast(deadOrders),
          col("l_orderkey") === col("o_orderkey"), "left"),
        col("o_orderkey")))
  }

  /** K-ANONYMITY / L-DIVERSITY audit — the re-identification-risk
    * report a data-governance pass runs before releasing a dataset
    * (Sweeney '02 / Machanavajjhala '07), completing the compliance
    * family next to `gdprDelete` and `text_pii`: customers group into
    * equivalence classes by quasi-identifier (nation, segment,
    * account-balance band — the attributes a linker could join on);
    * a class smaller than k re-identifies its members, and a class
    * whose SENSITIVE attribute (order priority) shows fewer than l
    * distinct values leaks it even at size ≥ k (the homogeneity
    * attack k-anonymity alone misses).
    *
    * Plan shape: one groupBy over the QI columns (class count), one
    * distinct-aggregate over the class × sensitive join for
    * l-diversity — both partial-aggregated before the exchange; the
    * sensitive join is keyed on c_custkey (no fan-out beyond each
    * customer's own orders). Every output is a count or an integer
    * comparison — hash-gated.
    */
  /** K-ANONYMITY REMEDIATION — the generalization step that follows
    * the [[kAnonymity]] audit (Sweeney's full-domain generalization,
    * per-record variant): each customer's balance band coarsens
    * through doubling widths (1000·2^ℓ, ℓ = 0..maxLevel) until the
    * (nation, segment, band) class it lands in reaches k members;
    * records whose class stays below k even at the coarsest level are
    * SUPPRESSED (level = −1, band = −1 — the release drops them).
    * Emitting the minimal adequate level per record is what a release
    * pipeline materializes: maximal utility (finest band) subject to
    * the k floor.
    *
    * Plan shape: maxLevel+1 partial-aggregated groupBys over one
    * projection (class sizes per level), joined back on their class
    * keys — no window, no driver loop; every output is an integer
    * count comparison, hash-gated.
    */
  def anonGeneralize(spark: SparkSession, sfDir: String,
      k: Int = 5, maxLevel: Int = 3): DataFrame = {
    val base = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        col("c_acctbal"))
    def bandAt(l: Int) =
      floor(col("c_acctbal") / (1000.0 * (1 << l))).cast("long")
    val withBands = (0 to maxLevel).foldLeft(base) { (df, l) =>
      df.withColumn(s"band_$l", bandAt(l))
    }
    val joined = (0 to maxLevel).foldLeft(withBands) { (df, l) =>
      val sizes = withBands
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col(s"band_$l"))
        .agg(count(lit(1)).as(s"sz_$l"))
      df.join(sizes, Seq("c_nationkey", "c_mktsegment", s"band_$l"))
    }
    val level = (0 to maxLevel).foldRight(lit(-1L): Column) { (l, rest) =>
      when(col(s"sz_$l") >= k, lit(l.toLong)).otherwise(rest)
    }
    val genBand = (0 to maxLevel).foldRight(lit(-1L): Column) { (l, rest) =>
      when(col("level") === l, col(s"band_$l")).otherwise(rest)
    }
    joined.withColumn("level", level)
      .select(col("c_custkey"),
        col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("segment"),
        col("level"),
        genBand.as("gen_band"),
        (col("level") === -1L).as("suppressed"))
  }

  /** ANONYMITY K-SWEEP — the release-policy tuning report beside
    * [[kAnonymity]]'s fixed-k audit (what does each candidate k COST
    * in suppression?): ONE equivalence-class rollup priced at
    * k ∈ {2, 5, 10, 20} — per k the violating-class count, the
    * records those classes hold (what suppression would delete), and
    * the suppressed share in integer micro-units by half-up division
    * (the q_interpolate discipline). The sweep is the `q_dedup_sweep`
    * grid shape: integer predicates over a broadcast k-grid, one
    * corpus pass no matter how many k's are priced.
    */
  def anonSweep(spark: SparkSession, sfDir: String): DataFrame = {
    val band = floor(col("c_acctbal") / 1000).cast("long").as("bal_band")
    val classes = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_mktsegment"), band)
      .groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(count(lit(1)).as("class_size"))
      .localCheckpoint()
    val tot = classes.agg(sum(col("class_size")).as("n_total"))
    val grid = classes.sparkSession.range(2, 21)
      .filter(col("id").isin(2L, 5L, 10L, 20L)).select(col("id").as("k"))
    classes.crossJoin(broadcast(grid))
      .groupBy("k")
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("class_size") < col("k"), 1L).otherwise(0L))
          .as("n_violating"),
        sum(when(col("class_size") < col("k"), col("class_size"))
          .otherwise(0L)).as("n_suppressed"))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("n_classes"), col("n_violating"),
        col("n_suppressed"),
        // half-up integer division: numerator is non-negative by
        // construction (suppressed counts ≥ 0) — the precondition the
        // shared idiom requires (see Relational.interpolate's
        // PRECONDITION note on Spark div vs DuckDB //)
        expr("(2 * (n_suppressed * 1000000) + n_total) div (2 * n_total)")
          .as("suppressed_micro"))
  }

  def kAnonymity(spark: SparkSession, sfDir: String,
      k: Int = 5, l: Int = 3): DataFrame = {
    val band = floor(col("c_acctbal") / 1000).cast("long").as("bal_band")
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"), band)
    val classes = cust.groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(count(lit(1)).as("class_size"))
    val ldiv = cust
      .join(Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderpriority")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(countDistinct(col("o_orderpriority")).as("l_div"))
    classes.join(ldiv, Seq("c_nationkey", "c_mktsegment", "bal_band"))
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("segment"), col("bal_band"),
        col("class_size"), col("l_div"),
        (col("class_size") >= k).as("k_anonymous"),
        (col("l_div") >= l).as("l_diverse"))
  }

  /** T-CLOSENESS AUDIT (`q_t_closeness`) — the third rung of the
    * re-identification ladder (Li, Li & Venkatasubramanian '07):
    * k-anonymity bounds CLASS SIZE, l-diversity bounds DISTINCT
    * sensitive values, but a class can pass both while its sensitive
    * DISTRIBUTION still leaks ("all 5 priorities present, but 96%
    * URGENT says plenty"). t-closeness bounds the distance between
    * each equivalence class's sensitive distribution and the global
    * one — for a categorical attribute, the VARIATIONAL distance
    * ½Σ|p_c − p_g|, computed EXACTLY by cross-multiplication:
    * Σ_v |c_v·N − g_v·n| / (2·n·N) where every term is a
    * DECIMAL(38,0) product of exact counts. Same (nation, segment,
    * balance-band) classes as [[kAnonymity]], one sensitive-histogram
    * shuffle + a #values-bounded broadcast join, one division.
    */
  def tCloseness(spark: SparkSession, sfDir: String,
      t: Double = 0.3): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val band = floor(col("c_acctbal") / 1000).cast("long").as("bal_band")
    val obs = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        band)
      .join(Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderpriority")),
        col("c_custkey") === col("o_custkey"))
    val cell = obs.groupBy("c_nationkey", "c_mktsegment", "bal_band",
      "o_orderpriority").agg(count(lit(1)).as("c_v"))
    val global = obs.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("g_v"))
    val tot = obs.agg(count(lit(1)).as("big_n"))
    // the full class x value grid (zero cells included: a priority a
    // class never shows still contributes |0·N − g_v·n|)
    val classes = cell.groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(sum(col("c_v")).as("n_class"))
    val grid = classes.crossJoin(broadcast(global))
      .join(cell,
        Seq("c_nationkey", "c_mktsegment", "bal_band", "o_orderpriority"),
        "left")
      .crossJoin(broadcast(tot))
      .select(col("c_nationkey"), col("c_mktsegment"), col("bal_band"),
        col("n_class"), col("big_n"),
        abs(coalesce(col("c_v"), lit(0L)).cast(DecimalType(19, 0)) *
          col("big_n") -
          col("g_v").cast(DecimalType(19, 0)) * col("n_class"))
          .cast(DecimalType(38, 0)).as("term"))
    grid.groupBy("c_nationkey", "c_mktsegment", "bal_band", "n_class",
      "big_n")
      .agg(sum(col("term")).as("l1_scaled"))
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("segment"), col("bal_band"),
        col("n_class").as("class_size"),
        round(col("l1_scaled").cast("double") /
          (lit(2.0) * col("n_class").cast("double") *
            col("big_n").cast("double")), 6).as("tvd"),
        (round(col("l1_scaled").cast("double") /
          (lit(2.0) * col("n_class").cast("double") *
            col("big_n").cast("double")), 6) <= t).as("t_close"))
  }

  /** Differentially-private release of per-(lang, source) corpus
    * statistics — the third leg of the governance family after the
    * [[kAnonymity]] audit and [[anonGeneralize]] remediation. Two
    * Laplace-mechanism releases per group: a COUNT (sensitivity 1 —
    * each document lives in exactly one group) and a SUM of
    * per-document char contributions CLIPPED at 1000 (contribution
    * bounding, the step that gives the sum a finite sensitivity at
    * all — unclipped, one outlier document would force unbounded
    * noise). The ε = 1 budget is split evenly, so b = 1/0.5 = 2 for
    * the count and b = 1000/0.5 = 2000 for the clipped sum.
    *
    * Noise is Laplace by inverse CDF over a PINNED md5-derived
    * uniform per (release, group) — the reproducible-release mode
    * (fixed RNG seed) a production pipeline uses so a re-run emits
    * the identical release; swapping the md5 uniform for a fresh
    * random draw at release time is what makes it DP against an
    * adversary who doesn't hold the seed. The uniform is a 32-bit
    * md5 prefix / 2³² (exact in double) and ln is bit-identical
    * across engines (measured), so the released doubles hash-gate.
    *
    * Plan shape: ONE partial-aggregated groupBy over one projection
    * (clip is scan-side), noise a per-group codegen'd projection —
    * O(#groups) output regardless of corpus size.
    */
  def dpCounts(spark: SparkSession, sfDir: String,
      clipChars: Int = 1000): DataFrame = {
    // Laplace(b) by inverse CDF from a [0,1) uniform; the 2^-32 floor
    // guards ln(0) on the measure-zero u = 0 draw (exact both engines)
    def lap(u: Column, b: Double): Column =
      -signum(u - lit(0.5)) * lit(b) *
        log(greatest(lit(1.0) - lit(2.0) * abs(u - lit(0.5)),
          lit(2.3283064365386963e-10)))
    def md5Unit(tag: String): Column =
      conv(substring(md5(concat(lit(tag + "_"), col("lang"), lit("_"),
        col("source"))), 1, 8), 16, 10).cast("double") / lit(4294967296.0)
    Tables.documents(spark, sfDir)
      .select(col("lang"), col("source"),
        least(col("n_chars"), lit(clipChars.toLong)).as("chars_c"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), sum(col("chars_c")).as("s"))
      .select(col("lang"), col("source"),
        // released at fixed precision (6 decimals): a published DP
        // release is a finite-precision number anyway, and the round
        // absorbs the ≤1-ulp ln disagreement between libm
        // implementations that raw doubles would leak into the gate
        round(col("n").cast("double") + lap(md5Unit("dpc"), 2.0), 6)
          .as("n_dp"),
        round(col("s").cast("double") +
          lap(md5Unit("dps"), clipChars * 2.0), 6).as("chars_dp"))
  }

  /** Benford's-law first-digit expectations, log10(1+1/d) rounded to
    * 6 — LITERALS in both engines (never engine libm log10). */
  private[graft] val BenfordExp: Seq[Double] = Seq(
    0.301030, 0.176091, 0.124939, 0.096910, 0.079181,
    0.066947, 0.057992, 0.051153, 0.045757)

  /** BENFORD FIRST-DIGIT AUDIT of o_totalprice — the classic
    * fabricated-/corrupted-numbers screen (a money column whose
    * leading digits stray far from log10(1+1/d) was binned, capped,
    * synthesized, or tampered with; auditors run exactly this
    * table): per digit the observed share vs Benford expectation,
    * plus the χ² distance and Nigrini's MAD verdict scalars.
    *
    * The first digit comes from the DECIMAL(18,2) string rendering
    * (both engines print "12345.67" — never floor(log10(x)), whose
    * libm boundary behavior is engine-dependent); rows below 1 are
    * excluded (their leading "0" is a scale artifact, not a digit).
    * ONE partial-aggregated scan to 9 counts; zero-count digits
    * still join in from the literal digit frame (their E still
    * enters χ² — the crosstab zero-cell discipline); χ²/MAD terms
    * round 6 and sum IN DECIMAL.
    */
  def benford(spark: SparkSession, sfDir: String): DataFrame =
    benfordOver(Tables.orders(spark, sfDir)
      .select(Relational.money(col("o_totalprice")).as("v")))

  /** Same audit over any (v: decimal(18,2)) frame — a planted
    * perfectly-Benford corpus pins χ² = 0, a planted single-digit
    * corpus pins the zero-cell terms. */
  def benfordOver(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val obs = df.filter(col("v") >= 1)
      .select(substring(col("v").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val expDf = spark.range(1, 10)
      .select(col("id").as("digit"),
        element_at(array(BenfordExp.map(lit(_)): _*), col("id").cast("int"))
          .as("exp_p"))
    val grid = expDf.join(obs, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        col("exp_p"))
      .localCheckpoint()
    val tot = grid.agg(sum(col("n")).as("tn"))
    val terms = grid.crossJoin(broadcast(tot))
      .withColumn("obs_raw",
        col("n").cast("double") / col("tn").cast("double"))
      .withColumn("e", col("tn").cast("double") * col("exp_p"))
    val scalars = terms
      .select(
        round((col("n").cast("double") - col("e")) *
          (col("n").cast("double") - col("e")) / col("e"), 6)
          .cast(DecimalType(18, 6)).as("c"),
        round(abs(col("obs_raw") - col("exp_p")), 6)
          .cast(DecimalType(18, 6)).as("m"))
      .agg(sum(col("c")).as("chi2d"), sum(col("m")).as("madd"))
    terms.crossJoin(broadcast(scalars))
      .select(col("digit"), col("n"),
        round(col("obs_raw"), 6).as("obs_p"), col("exp_p"),
        round(col("chi2d").cast("double"), 6).as("chi2"),
        round(col("madd").cast("double") / 9.0, 6).as("mad"))
  }

  /** SPLIT-ORDER AUDIT — the procurement-fraud screen beside
    * `q_benford`'s digit test: multiple orders by the SAME customer
    * on the SAME day (the pattern of splitting one purchase into
    * several to stay under an approval limit). One partial-aggregated
    * groupBy on (customer, day) over exact cents; only multi-order
    * days surface, with the combined amount, the largest single
    * order, and its share of the day — O(flagged days) output at any
    * corpus size, no self-join, no window.
    */
  def splitOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        to_date(date_trunc("DAY", col("o_orderdate"))).as("day"),
        (Relational.money(col("o_totalprice")) * 100).cast("long").as("cents"))
      .groupBy("o_custkey", "day")
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("day_cents"),
        max(col("cents")).as("max_single"))
      .filter(col("n_orders") > 1)
      .select(col("o_custkey"), col("day"), col("n_orders"),
        col("day_cents"), col("max_single"),
        round(col("max_single").cast("double")
          / col("day_cents").cast("double"), 6).as("largest_share"))

  /** SURVIVORSHIP (golden-record construction) over the near-dup
    * clusters — the MDM step after matching: `dedup_clusters` GROUPS
    * the corpus (connected components over verified near-dup pairs);
    * this MERGES each multi-member cluster into one best record by
    * per-FIELD rules (the Talend/Informatica survivorship pattern):
    * id = min doc_id, text from the LONGEST member (ties to the
    * smaller id), lang and source by CLUSTER MODE (ties to the
    * alphabetically first value). Singletons need no merging and are
    * dropped.
    *
    * Scale shape: every rule is a pure partial-aggregated
    * aggregation — argmax via `max(struct(n_chars, −doc_id))`, mode
    * via `min(struct(−cnt, value))` over the per-(cluster, value)
    * count frame — NO per-cluster windows, so one hot cluster is one
    * aggregation key, never one task. The cluster assignment itself
    * rides the banded/df-capped candidate path `dedup_clusters`
    * already runs at 100 TB.
    */
  def survivorship(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Scratch.persistDeferred(
      Dedup.clusters(spark, sfDir)
        .join(Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("n_chars"), col("lang"), col("source")),
          "doc_id"))
    val base = d.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        min(col("doc_id")).as("canonical_id"),
        max(struct(col("n_chars"), (-col("doc_id")).as("nid")))
          .as("longest"))
      .filter(col("n_members") > 1)
    def mode(field: String): DataFrame = d
      .groupBy(col("cluster_id"), col(field))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("cluster_id")
      .agg(min(struct((-col("cnt")).as("nc"), col(field)))
        .as(s"m_$field"))
    base
      .join(mode("lang"), "cluster_id")
      .join(mode("source"), "cluster_id")
      .select(col("cluster_id"), col("n_members"), col("canonical_id"),
        col("longest.n_chars").as("best_chars"),
        (-col("longest.nid")).as("best_doc"),
        col("m_lang.lang").as("lang"),
        col("m_source.source").as("source"))
  }
}
