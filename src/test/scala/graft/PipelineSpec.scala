package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IncrementalDedup, Pipeline}

class PipelineSpec extends SparkSpec {

  test("curate keeps only canonical, wordy, english docs") {
    val c = Pipeline.curate(spark, sf, minWords = 20).cache()
    assert(c.count() > 0)
    assert(c.count() < Tables.documents(spark, sf).count())
    assert(c.filter(col("n_words") < 20).isEmpty)
    assert(c.filter(col("pred_lang") =!= "en").isEmpty)
    // no two near-dup cluster members survive
    val clusters = Dedup.clusters(spark, sf)
    val survivors = c.join(clusters, "doc_id")
    assert(survivors.groupBy("cluster_id").count()
      .filter(col("count") > 1).isEmpty)
  }

  test("domain cap: budget enforced, overshoot at most one doc") {
    val c = Pipeline.domainCap(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    assert(c.count() === docs.count()) // every doc classified
    // recompute the budget independently
    val row = docs.select(
      sum(size(filter(split(col("text"), "\\s+"), x => x =!= ""))
        .cast("long")).as("total"),
      countDistinct(col("source")).as("ns")).head()
    val budget = row.getLong(0) / (2L * row.getLong(1))
    // a doc is kept iff its prefix mass is under budget (the
    // straddler is IN, so kept mass may overshoot by < one doc)
    assert(c.filter(col("kept") && col("cum_before") >= budget).isEmpty)
    assert(c.filter(!col("kept") && col("cum_before") < budget).isEmpty)
    val keptMass = c.filter(col("kept")).groupBy("source")
      .agg(sum(col("n_tokens")).as("m"),
        max(col("n_tokens")).as("biggest")).cache()
    assert(keptMass.filter(col("m") >= lit(budget) + col("biggest")).isEmpty)
    // capping binds: every source keeps something and drops something
    val nSrc = row.getLong(1)
    assert(c.filter(col("kept")).select("source").distinct().count() === nSrc)
    assert(c.filter(!col("kept")).select("source").distinct().count() === nSrc)
    keptMass.unpersist(); c.unpersist()
  }

  test("leakage-safe split: no near-dup pair ever spans train/eval") {
    val split = Pipeline.leakageSafeSplit(spark, sf).cache()
    assert(split.count() == Tables.documents(spark, sf).count())
    assert(split.select("split").distinct().count() == 2)
    // the guarantee: for every near-dup pair, both sides share a split
    val s = split.select(col("doc_id"), col("split"))
    val pairs = Dedup.ngramJaccard(spark, sf, 0.5)
      .join(s.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "split_a"), "doc_a")
      .join(s.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "split_b"), "doc_b")
    assert(pairs.filter(col("split_a") =!= col("split_b")).isEmpty,
      "a near-duplicate pair crossed the train/eval boundary")
  }

  test("leakage-safe split: exact path gives the hard guarantee and " +
      "matches the LSH path on true-dup corpora") {
    val exact = Pipeline.leakageSafeSplit(spark, sf, exact = true).cache()
    val lsh = Pipeline.leakageSafeSplit(spark, sf)
    // this corpus's near-dups are true dups (jaccard ≈ 1), where LSH
    // recall is ≈100% — both paths must land on the identical split
    assert(exact.exceptAll(lsh).isEmpty && lsh.exceptAll(exact).isEmpty)
    // and the exact path's guarantee is unconditional: every
    // exact-candidate near-dup pair shares a split
    val s = exact.select(col("doc_id"), col("split"))
    val pairs = Dedup.ngramJaccard(spark, sf, 0.5)
      .join(s.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "split_a"), "doc_a")
      .join(s.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "split_b"), "doc_b")
    assert(pairs.filter(col("split_a") =!= col("split_b")).isEmpty)
  }

  test("stratified sample rates are deterministic and per-language") {
    val a = Pipeline.stratifiedSample(spark, sf).cache()
    val b = Pipeline.stratifiedSample(spark, sf)
    assert(a.exceptAll(b).isEmpty) // bit-reproducible
    // en keeps more than fr (12/16 vs 2/16 target rates)
    val byLang = a.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.documents(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en").toDouble / total("en") >
      byLang.getOrElse("fr", 0L).toDouble / total("fr"))
  }

  test("packBins range-partitioned plan equals the naive per-shard window") {
    import org.apache.spark.sql.expressions.Window
    // naive reference: the nShards-parallel window the scalable
    // implementation replaced — identical output is the contract
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = Tables.documents(spark, sf)
      .select(col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
          .cast("long") % 8).as("shard"),
        size(filter(split(col("text"), "\\s+"), x => x =!= ""))
          .cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / 2000).cast("long"))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
    val scaled = Pipeline.packBins(spark, sf)
    assert(scaled.exceptAll(naive).isEmpty && naive.exceptAll(scaled).isEmpty,
      "range-partitioned packing diverged from the sequential-fill contract")
  }

  test("mixture weights: shares sum to 1, cap binds exactly when the " +
      "uncapped weight exceeds it") {
    val m = Pipeline.mixWeights(spark, sf).cache()
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(m.count() == langs)
    val shareSum = m.agg(sum("share")).head().getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-9)
    assert(m.filter(col("weight") <= 0 || col("weight") > 4.0).isEmpty)
    // weight < cap ⟺ it equals the equal-share target ratio
    val n = langs.toDouble
    assert(m.filter(col("weight") < 4.0 &&
      abs(col("weight") * col("share") * n - 1.0) > 1e-9).isEmpty)
  }

  test("mix sample: per-doc copies bracket the language weight and " +
      "per-language mass lands within binomial expectation") {
    val w = Pipeline.mixWeights(spark, sf)
      .select(col("lang"), col("weight")).cache()
    val s = Pipeline.mixSample(spark, sf).cache()
    // every emitted copy count is floor(weight) or ceil(weight)
    val bad = s.join(w, "lang")
      .filter(col("n_copies") < floor(col("weight")) ||
        col("n_copies") > ceil(col("weight")))
    assert(bad.isEmpty, "n_copies outside [floor(w), ceil(w)]")
    // docs with zero copies (downsampled languages) are absent, so
    // mass must be counted against the FULL per-language doc count
    val perLang = Tables.documents(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .join(s.groupBy("lang").agg(sum("n_copies").as("mass")), Seq("lang"), "left")
      .na.fill(0L, Seq("mass"))
      .join(w, "lang")
    // E[mass] = n_docs * weight; tolerance = 4σ of the Bernoulli
    // fractional part (σ² ≤ n/4), floored for tiny languages
    val off = perLang.filter(
      abs(col("mass") - col("n_docs") * col("weight")) >
        greatest(lit(4.0) * sqrt(col("n_docs").cast("double")) / lit(2.0), lit(3.0)))
    assert(off.isEmpty, s"mixture mass off target: ${off.collect().mkString}")
  }

  test("quantile buckets: planted values land in exact deciles, ties " +
      "at a cutpoint go to the lower bucket, real corpus is balanced") {
    import spark.implicits._
    // 1..4 with nBuckets=2: cutpoint = p50 = 2.5 → buckets 1,1,2,2
    val small = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))
      .toDF("doc_id", "x")
    val got2 = Pipeline.quantileBucketsOver(small, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got2 == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L), s"$got2")
    // tie case: 1,2,3 with nBuckets=3 → cuts (p33, p66) = (5/3, 7/3);
    // x=2 sits strictly between; x exactly ON a cutpoint stays lower:
    // 1..5, nBuckets=2 → p50 = 3.0, so x=3 (== cutpoint) → bucket 1
    val tie = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0), (5L, 5.0))
      .toDF("doc_id", "x")
    val gotTie = Pipeline.quantileBucketsOver(tie, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(gotTie(3L) == 1L, s"tie at cutpoint must stay lower: $gotTie")
    // real corpus: every doc bucketed 1..10, deciles balanced within
    // the slack duplicated n_chars values force
    val b = Pipeline.quantileBuckets(spark, sf).cache()
    assert(b.count() == Tables.documents(spark, sf).count())
    assert(b.filter(col("bucket") < 1 || col("bucket") > 10).isEmpty)
    val sizes = b.groupBy("bucket").count().select("count")
      .collect().map(_.getLong(0))
    val n = b.count()
    assert(sizes.max <= (n * 2) / 10 + 1, s"decile wildly unbalanced: ${sizes.toSeq}")
  }

  test("decontamination boundary: a verbatim 13-gram quote is flagged, " +
      "a 12-word overlap and clean docs are not, benchmark excluded") {
    import spark.implicits._
    val bench = ('a' to 'm').map(c => s"$c$c").mkString(" ") // 13 words
    val twelve = ('a' to 'l').map(c => s"$c$c").mkString(" ")
    val docs = Seq(
      (0L, s"benchmark says $bench and more"),
      (21L, s"a copyist wrote $bench verbatim here"),          // full quote
      (22L, s"$twelve only"),                                  // 12-word prefix
      (23L, "entirely unrelated words in this document body"))
      .toDF("doc_id", "text")
    val dir = TempDirs.create("graft_decontam_spec").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Pipeline.decontaminate(spark, dir, nBench = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.get(21L).exists(_ >= 1L), s"quote not flagged: $got")
    assert(!got.contains(22L), s"12-word overlap flagged: $got")
    assert(!got.contains(23L) && !got.contains(0L), s"false flag: $got")
  }

  test("decontamination sweep: flagged docs are non-increasing in n, " +
      "and the 13-gram leg agrees with the single-n gate") {
    import org.apache.spark.sql.functions.col
    val r = Pipeline.decontaminateSweep(spark, sf).orderBy("n_gram")
      .collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(4L, 8L, 13L))
    // a longer n can only flag a subset of what a shorter n flags
    assert(r.sliding(2).forall { w =>
      w(0).getLong(1) >= w(1).getLong(1)
    }, s"flag counts not non-increasing: ${r.mkString(", ")}")
    // the n=13 leg IS q_decontaminate's flagged-doc set size
    val direct = Pipeline.decontaminate(spark, sf).count()
    assert(r.last.getLong(1) == direct,
      s"13-gram leg ${r.last.getLong(1)} != q_decontaminate $direct")
    r.foreach { row =>
      val rate = row.getAs[Double]("flag_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("fuzzy decontamination: a paraphrased benchmark doc that defeats " +
      "the exact 13-gram gate is still flagged; clean docs are not") {
    import spark.implicits._
    // 40 distinct words; the "paraphrase" swaps one word per 13-word
    // stretch, so NO verbatim 13-gram survives but shingle Jaccard
    // stays high
    def word(i: Int) = "q" + ('a' + i / 26).toChar + ('a' + i % 26).toChar
    val benchWords = (1 to 40).map(word)
    val para = benchWords.zipWithIndex.map {
      case (w, idx) => if (idx % 13 == 6) w.reverse + "x" else w }
    val docs = Seq(
      (0L, benchWords.mkString(" ")),                 // the benchmark doc
      (21L, para.mkString(" ")),                      // paraphrased copy
      (22L, (100 to 140).map(word).mkString(" ")))    // clean
      .toDF("doc_id", "text")
    val dir = TempDirs.create("graft_fuzzy_decontam_spec").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val exact = Pipeline.decontaminate(spark, dir, nBench = 20)
      .collect().map(_.getLong(0)).toSet
    assert(!exact.contains(21L),
      s"paraphrase should defeat the exact 13-gram gate: $exact")
    val fuzzy = Pipeline.decontaminateFuzzy(spark, dir, nBench = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fuzzy.get(21L).exists(_ >= 8L),
      s"paraphrased near-dup not flagged: $fuzzy")
    assert(!fuzzy.contains(22L) && !fuzzy.contains(0L),
      s"false flag: $fuzzy")
  }

  test("fuzzy decontamination flags the corpus's planted cross-boundary " +
      "near-dups with near-full signature agreement") {
    val got = Pipeline.decontaminateFuzzy(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // known planted near-dups across the doc_id<20 benchmark boundary
    // at sf0.001 (jaccard ≈ 0.95-0.99 measured corpus-side)
    assert(got.get((369L, 16L)).exists(_ >= 14L), s"369~16 missing: $got")
    assert(got.get((360L, 8L)).exists(_ >= 14L), s"360~8 missing: $got")
    assert(got.keys.forall(_._2 < 20L) && got.keys.forall(_._1 >= 20L))
    val est = Pipeline.decontaminateFuzzy(spark, sf)
      .select("est_jaccard").collect().map(_.getDouble(0))
    assert(est.forall(e => e >= 0.5 && e <= 1.0))
  }

  test("chunking: overlap carries context, tail survives, short doc = one chunk") {
    import spark.implicits._
    // WordSplit is [^\p{L}]+ — digits split, so words must be letters
    def word(i: Int) = "w" + ('a' + i / 26).toChar + ('a' + i % 26).toChar
    val w80 = (1 to 80).map(word).mkString(" ")
    val w10 = (1 to 10).map(i => "s" + word(i)).mkString(" ")
    val docs = Seq((1L, w80), (2L, w10), (3L, "")).toDF("doc_id", "text")
    val c = Pipeline.chunkOver(docs, chunkSize = 32, stride = 24)
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = c.filter(_.getLong(0) == 1L)
    // n=80: 1 + ceil(48/24) = 3 chunks at words 1-32, 25-56, 49-80
    assert(d1.length == 3, s"expected 3 chunks, got ${d1.length}")
    val texts = d1.map(_.getString(3))
    assert(texts(0) == (1 to 32).map(word).mkString(" "))
    assert(texts(1) == (25 to 56).map(word).mkString(" "))
    assert(texts(2) == (49 to 80).map(word).mkString(" "),
      "tail tokens dropped")
    // overlap: last 8 words of chunk 0 = first 8 of chunk 1
    assert(texts(0).split(" ").takeRight(8).sameElements(
      texts(1).split(" ").take(8)), "overlap broken")
    assert(c.count(_.getLong(0) == 2L) == 1, "short doc must be one chunk")
    assert(!c.exists(_.getLong(0) == 3L), "empty doc must emit nothing")
    // losslessness: every word position of doc 1 is covered
    val covered = d1.flatMap(_.getString(3).split(" ")).toSet
    assert((1 to 80).forall(i => covered(word(i))), "coverage gap")
  }

  test("temperature mixing boosts low-resource languages, shares sum to 1") {
    import spark.implicits._
    val docs = Seq.tabulate(90)(i => (s"big $i words here", "en")) ++
      Seq.tabulate(10)(i => (s"small $i", "zh"))
    val m = Pipeline.mixTemperatureOver(
        docs.toDF("text", "lang")).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (enShare, enTemp, enBoost) = m("en")
    val (zhShare, zhTemp, zhBoost) = m("zh")
    assert(math.abs(enTemp + zhTemp - 1.0) < 1e-9, "temp shares must sum to 1")
    assert(zhBoost > 1.0 && enBoost < 1.0,
      s"sqrt-temperature must upweight the small slice: $m")
    assert(zhTemp > zhShare && enTemp < enShare)
    // α=1/2 flattens but must NOT invert the ordering
    assert(enTemp > zhTemp, "flattening must preserve rank order")
  }

  test("DSIR selects target-like raw docs over gibberish") {
    import spark.implicits._
    val target = "the quick brown fox jumps over the lazy dog again"
    // 20 target (en) docs establish the target LM; two scored raw
    // docs: one written in target vocabulary, one in unique noise
    val docs = (Seq.tabulate(20)(i => (i.toLong, "en", target)) :+
      (100L, "fr", "quick brown fox jumps over lazy dog") :+
      (101L, "fr", "zzq xkcd qwerty asdf zxcv uiop hjkl vbnm"))
      .toDF("doc_id", "lang", "text")
    val sel = Pipeline.dsirSelectOver(docs, nBuckets = 4096, k = 21)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(sel.contains(100L), "target-like raw doc must be selected")
    assert(!sel.contains(101L), "gibberish doc must fall below the cut")
    // scores must rank the target-like doc above every absent doc
    assert(sel(100L) <= 21L)
  }

  test("drift PSI: identical halves stay under the 0.1 stability bar " +
      "and every term is finite") {
    val terms = Pipeline.driftPsi(spark, sf).collect()
    assert(terms.length == 10, s"expected 10 buckets, got ${terms.length}")
    val psi = terms.map(r => math.abs(r.getDouble(3))).sum
    // both halves draw from the same synthetic distribution — the
    // conventional "stable" verdict must hold
    assert(psi < 0.1, s"same-distribution corpus flagged as drifted: $psi")
    assert(terms.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    // baseline deciles: run-1 counts are near-equal by construction
    val n1 = terms.map(_.getLong(1))
    assert(n1.max - n1.min <= n1.sum / 10 + 1,
      s"baseline deciles unbalanced: ${n1.toSeq}")
  }

  test("corpus report matches directly-computed ground truth") {
    val r = Pipeline.corpusReport(spark, sf).collect().head
    val docs = Tables.documents(spark, sf).cache()
    assert(r.getLong(0) == docs.count())
    assert(r.getLong(1) == docs.select("lang").distinct().count())
    assert(r.getLong(5) ==
      docs.count() - docs.select("text").distinct().count())
    val shareEn =
      docs.filter(col("lang") === "en").count().toDouble / docs.count()
    assert(math.abs(r.getDouble(6) - shareEn) < 1e-12)
    docs.unpersist()
  }

  test("sequence packing: placements tile each shard contiguously " +
      "and span counts match the window") {
    import org.apache.spark.sql.expressions.Window
    val L = 512L
    val got = Pipeline.packSequences(spark, sf, seqLen = L).cache()
    // absolute start = seq_id*L + pos must equal the same-shard prefix
    // sum of earlier docs (single-partition window is fine at spec SF)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bad = got
      .withColumn("start", col("seq_id") * L + col("pos"))
      .withColumn("want", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("start") =!= col("want"))
    assert(bad.isEmpty, s"non-contiguous placements: ${bad.count()}")
    // span count consistent with pos + n_tokens
    assert(got.filter(col("n_seqs") =!=
      (floor((col("pos") + col("n_tokens") - 1) / L) + 1)).isEmpty)
    assert(got.filter(col("pos") < 0 || col("pos") >= L
      || col("n_seqs") < 1).isEmpty)
    got.unpersist()
  }

  test("epoch shuffle: dense per-shard positions, every doc placed " +
      "once, reseeding permutes, reruns don't") {
    val e1 = Pipeline.epochShuffle(spark, sf).cache()
    val docs = Tables.documents(spark, sf).count()
    assert(e1.count() == docs)
    assert(e1.select("doc_id").distinct().count() == docs)
    // positions dense 1..shardSize within each shard
    assert(e1.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
        min(col("pos")).as("mn"), countDistinct(col("pos")).as("d"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("d") =!= col("n"))
      .isEmpty)
    // deterministic rerun; a different seed produces a different order
    val e2 = Pipeline.epochShuffle(spark, sf)
    assert(e1.exceptAll(e2).isEmpty && e2.exceptAll(e1).isEmpty)
    val e3 = Pipeline.epochShuffle(spark, sf, seed = "epoch2")
    assert(e1.join(e3, Seq("doc_id", "shard", "pos")).count() < docs)
    e1.unpersist()
  }

  test("group sample: k per group, ranks contiguous, window replay " +
      "agrees, and reruns are identical") {
    import org.apache.spark.sql.expressions.Window
    val k = 8
    val g = Pipeline.groupSample(spark, sf, k).cache()
    val sizes = Tables.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    // every group contributes min(k, group size) rows, ranks 1..that
    val per = g.groupBy("event_type")
      .agg(count(lit(1)).as("got"), max("rnk").as("maxr"), min("rnk").as("minr"))
      .join(sizes, "event_type")
    assert(per.filter(col("got") =!= least(lit(k.toLong), col("n"))).isEmpty)
    assert(per.filter(col("minr") =!= 1 || col("maxr") =!= col("got")).isEmpty)
    // independent replay: the per-group window the operator avoids
    val w = Window.partitionBy("event_type")
      .orderBy(col("hk"), col("event_id"))
    val replay = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        md5(col("event_id").cast("string").cast("binary")).as("hk"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
    assert(g.exceptAll(replay).isEmpty && replay.exceptAll(g).isEmpty)
    val again = Pipeline.groupSample(spark, sf, k)
    assert(g.exceptAll(again).isEmpty && again.exceptAll(g).isEmpty)
  }

  test("vector stats cover every label with sane norms") {
    val v = Pipeline.vectorStats(spark, sf).cache()
    val labels = Tables.embeddings(spark, sf)
      .select("label").distinct().count()
    assert(v.count() == labels)
    assert(v.filter(col("min_norm") <= 0 || col("max_norm") < col("min_norm")).isEmpty)
    assert(v.agg(sum("n")).head().getLong(0) ==
      Tables.embeddings(spark, sf).count())
  }

  test("shard writer: rows equal the curated mixture epoch, per-shard " +
      "positions are dense, and a first-attempt task failure still " +
      "commits exactly-once") {
    import graft.sources.v2.GraftSink
    GraftSink.aborted.set(0)
    GraftSink.failFirstAttempt.set(true)
    val out = try Pipeline.shardWrite(spark, sf).cache()
      finally GraftSink.failFirstAttempt.set(false)
    assert(GraftSink.aborted.get() >= 1,
      "the injected failure never aborted a writer")
    // total shard rows = sum of epoch copies over the curated set
    val curated = Pipeline.curate(spark, sf).select("doc_id")
    val expected = Pipeline.mixSample(spark, sf).join(curated, "doc_id")
      .agg(sum("n_copies")).head().getLong(0)
    assert(out.count() == expected)
    // per-shard positions are dense 1..n (the epoch-shuffle contract
    // survives the sink round trip)
    val holes = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mn") =!= 1L || col("mx") =!= col("n"))
    assert(holes.isEmpty)
    // token counts are the trained tokenizer's (bpe_apply), verbatim
    val bpe = graft.operators.TextAnalysis.bpeApply(spark, sf)
      .select(col("doc_id"), col("n_tokens").as("bpe_tokens"))
    assert(out.join(bpe, "doc_id")
      .filter(col("n_tokens") =!= col("bpe_tokens")).isEmpty)
    out.unpersist()
  }

  test("curriculum: global positions are a permutation, phases are " +
      "length-monotone blocks, within-phase order is the md5 shuffle") {
    val c = Pipeline.curriculum(spark, sf).cache()
    val n = c.count()
    // global_pos is exactly 1..n
    val g = c.agg(min("global_pos"), max("global_pos"),
      countDistinct("global_pos")).head()
    assert(g.getLong(0) == 1L && g.getLong(1) == n && g.getLong(2) == n)
    // phases are weakly length-ordered: max tokens of phase p never
    // exceeds min tokens of phase p+1 (equal lengths share a phase)
    val stats = c.groupBy("phase")
      .agg(min("n_tokens").as("mn"), max("n_tokens").as("mx"),
        min("global_pos").as("gmn"), max("global_pos").as("gmx"),
        count(lit(1)).as("sz"))
      .orderBy("phase").collect()
    stats.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("mx") <= b.getAs[Long]("mn"),
        s"phase ${a.getLong(0)} max ${a.getAs[Long]("mx")} > " +
          s"phase ${b.getLong(0)} min ${b.getAs[Long]("mn")}")
      // each phase owns a contiguous global block
      assert(a.getAs[Long]("gmx") + 1 == b.getAs[Long]("gmn"))
      case _ => ()
    }
    stats.foreach { r =>
      assert(r.getAs[Long]("gmx") - r.getAs[Long]("gmn") + 1
        == r.getAs[Long]("sz"))
    }
    // within a phase the order is the seed-keyed md5, NOT length
    // order: positions must not be sorted by n_tokens (the shuffle
    // de-correlates) — check phase 1 is not monotone in tokens
    val p1 = c.filter(col("phase") === 1)
      .orderBy("phase_pos").select("n_tokens").collect().map(_.getLong(0))
    assert(p1.length < 3 || !p1.sliding(2).forall(w => w(0) <= w(1)),
      "within-phase order unexpectedly length-sorted")
    c.unpersist()
  }

  test("shard append: read-back equals the one-shot dedup + shard replay, " +
      "both runs land, and a planted cross-run dup is dropped") {
    import spark.implicits._
    val out = Pipeline.shardAppend(spark, sf).cache()
    // one-shot replay: global min-id canonical + md5 shard + run tag
    val docs = Tables.documents(spark, sf)
    val thr = docs.agg(
      floor((min(col("doc_id")) + max(col("doc_id"))) / lit(2.0))
        .cast("long").as("t"))
    val exp = docs
      .withColumn("c",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("c"))
      .crossJoin(broadcast(thr))
      .select(
        (conv(substring(md5(concat(lit("shard:"), col("doc_id"))), 1, 6),
          16, 10).cast("long") % 8).as("shard"),
        col("doc_id"),
        when(col("doc_id") <= col("t"), "r1").otherwise("r2").as("run"))
    assert(out.except(exp).isEmpty && exp.except(out).isEmpty)
    assert(out.select("run").distinct().count() == 2)
    out.unpersist()
    // planted cross-run dup: the store's fingerprint kills the rerun
    val store = Seq((1L, "same text here"), (2L, "unique a"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "same text here"), (11L, "unique b"),
      (12L, "unique b")).toDF("doc_id", "text")
    val dir = graft.TempDirs.create("graft_fp_spec").toString
    IncrementalDedup.writeFingerprints(store, dir, "r1")
    val decided = IncrementalDedup
      .decideWithStore(spark.read.parquet(s"$dir/fp"), batch)
      .join(batch.select("doc_id"), "doc_id")
    // 10 dups against the store's doc 1; 12 dups against batch-min 11
    assert(decided.filter(col("is_dup")).select("doc_id")
      .as[Long].collect().sorted.sameElements(Array(10L, 12L)))
    assert(decided.filter(col("doc_id") === 10L)
      .select("canonical_id").as[Long].head() == 1L)
  }

  test("WAP: a dirty batch quarantines (zero visible rows, ids absent " +
      "from the store) while clean batches publish atomically") {
    import spark.implicits._
    def mk(rows: Seq[(Long, String, Long)]) =
      rows.toDF("doc_id", "text", "n_chars")
    val clean1 = mk(Seq((1L, "alpha", 5L), (2L, "beta", 4L)))
    val dirty = mk(Seq((10L, "gamma", 5L), (11L, "", -1L)))
    val clean2 = mk(Seq((20L, "delta", 5L)))
    val dir = TempDirs.create("graft_wap_spec").toString
    val ledger = Pipeline.wapRun(spark,
      Seq(("a", clean1), ("b", dirty), ("c", clean2)), dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4))).toSet
    assert(ledger == Set(
      ("a", 2L, 0L, true, 2L),
      ("b", 2L, 1L, false, 0L),
      ("c", 1L, 0L, true, 1L)), s"ledger=$ledger")
    // the quarantined batch's rows are ABSENT from the manifest store
    // (not merely uncounted) — including its clean row
    val ids = graft.sources.v2.GraftSink
      .readBack(spark, dir, Pipeline.WapSchema)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 20L), s"visible ids=$ids")
    // registry composition on the real corpus: r1 publishes all its
    // rows, the poisoned r2 quarantines entirely
    val reg = Pipeline.wap(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getBoolean(3), r.getLong(4))).toMap
    assert(reg("r1")._1 && reg("r1")._2 > 0)
    assert(!reg("r2")._1 && reg("r2")._2 == 0L)
  }

  test("WAP: an empty batch audits clean (bad=0) and publishes zero " +
      "rows instead of NPE-ing on the null sum") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Long)]
      .toDF("doc_id", "text", "n_chars")
    val dir = TempDirs.create("graft_wap_empty").toString
    val ledger = Pipeline.wapRun(spark, Seq(("e", empty)), dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4))).toSet
    assert(ledger == Set(("e", 0L, 0L, true, 0L)), s"ledger=$ledger")
  }

  test("k-fold: fold is a pure function of the user (no straddle), " +
      "folds are balanced, and totals conserve") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val folds = graft.operators.Pipeline.kfoldAssign(spark, sf).cache()
    assert(folds.count() == 5, "expected exactly 5 folds")
    // conservation: fold event counts partition the corpus
    assert(folds.agg(sum("n_events")).head.getLong(0) == ev.count())
    // no straddle: per-fold distinct users partition the user set
    assert(folds.agg(sum("n_users")).head.getLong(0) ==
      ev.select("user_id").distinct.count())
    // balance: md5-uniform assignment keeps every fold within a few
    // binomial standard deviations of the even share (±3σ, floor 3
    // users — the spec SF has few users, so the absolute floor does
    // the work there; at real user counts the relative bound bites)
    val users = ev.select("user_id").distinct.count().toDouble
    val off = folds.select(max(abs(col("n_users") - lit(users / 5.0))))
      .head.getDouble(0)
    val sigma = math.sqrt(users * 0.2 * 0.8)
    assert(off <= math.max(3.0, 3.0 * sigma), s"fold imbalance $off")
    folds.unpersist()
  }

  test("effective sample size: equal weights pin ESS = n, a planted " +
      "whale collapses it") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = TempDirs.create("graft_ess").toString
    // s1: three equal docs -> ESS = 3; s2: a whale among minnows ->
    // ESS = (1+1+98)^2 / (1+1+9604) = 10000/9606
    Seq((1L, "x", "en", "s1", 10L), (2L, "x", "en", "s1", 10L),
      (3L, "x", "en", "s1", 10L),
      (4L, "x", "en", "s2", 1L), (5L, "x", "en", "s2", 1L),
      (6L, "x", "en", "s2", 98L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.Pipeline.effectiveSampleSize(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("s1") == ((3L, 3.0, 1.0)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("s2")._2 == r6(10000.0 / 9606.0), s"got ${out("s2")}")
  }
}
