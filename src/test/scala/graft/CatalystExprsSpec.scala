package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.CatalystExprs._

class CatalystExprsSpec extends SparkSpec {

  import spark.implicits._

  test("word_ngrams: distinct 3-gram count is ≤ max(0, n-2), empty below 3") {
    val cases = Seq(
      "", "one", "one two", "one two three", "a b c d e",
      "x x x x", "ü ö ä ß mixed unicode tokens")
    val df = cases.toDF("text")
      .select(col("text"),
        size(word_ngrams(filter(split(col("text"), "[^\\p{L}]+"), w => w =!= ""), 3))
          .as("n_sh"),
        size(filter(split(col("text"), "[^\\p{L}]+"), w => w =!= "")).as("n_w"))
    df.collect().foreach { r =>
      val (nsh, nw) = (r.getInt(1), r.getInt(2))
      assert(nsh <= math.max(0, nw - 2),
        s"'${r.getString(0)}' → $nsh shingles from $nw words")
      if (nw < 3) assert(nsh == 0)
    }
  }

  test("dot_product equals a driver-side computation (property)") {
    val gen = Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0))
    val samples = (0 until 10).flatMap { i =>
      for {
        a <- gen(Gen.Parameters.default, Seed(i * 2L))
        b <- gen(Gen.Parameters.default, Seed(i * 2L + 1))
      } yield (a, b)
    }
    val df = samples.toDF("a", "b")
      .select(col("a"), col("b"), dot_product(col("a"), col("b")).as("dp"))
    df.collect().foreach { r =>
      val a = r.getSeq[Double](0)
      val b = r.getSeq[Double](1)
      // same left-to-right order as the expression's loop
      val want = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      assert(r.getDouble(2) == want)
    }
  }

  test("xxhash_array matches the builtin xxhash64 per element") {
    val df = Seq(Seq("alpha", "beta", "gamma")).toDF("arr")
      .select(xxhash_array(col("arr")).as("got"),
        transform(col("arr"), e => xxhash64(e)).as("want"))
    val r = df.head()
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  test("simhash64 of identical token sets is identical; empty is stable") {
    val df = Seq(
      ("a", Seq("x", "y", "z")),
      ("b", Seq("x", "y", "z")),
      ("c", Seq.empty[String])).toDF("id", "toks")
      .select(col("id"), simhash64(xxhash_array(col("toks"))).as("sh"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    // empty input: every bit satisfies 0*2 >= 0 → all ones, stable
    assert(m("c") == -1L)
  }

  test("band_keys: same signature → same keys; different → some differ") {
    val sig1 = Seq.tabulate(128)(i => i.toLong)
    val sig2 = Seq.tabulate(128)(i => i.toLong + 1)
    val df = Seq(("a", sig1), ("b", sig1), ("c", sig2)).toDF("id", "sig")
      .select(col("id"), band_keys(col("sig"), 16, 8).as("bk"))
    val m = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(m("a") == m("b"))
    assert(m("a") != m("c"))
    assert(m("a").size == 16)
  }

  test("no custom expression is a CodegenFallback; full hashing + SRP " +
      "pipeline evaluates under CODEGEN_ONLY") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import graft.operators.{Dedup, Similarity}
    // direct structural check: every hot-path expression generates
    // real code (a CodegenFallback would embed an interpreted eval
    // call inside the generated stage)
    val words = filter(split(lit("one two three four five"), " "), w => w =!= "")
    val exprs = Seq(
      word_ngrams(words, 3),
      xxhash_array(words),
      Dedup.minhashSignature(words),
      band_keys(Dedup.minhashSignature(words), 16, 8),
      simhash64(xxhash_array(words)),
      dot_product(array(lit(1.0)), array(lit(2.0))),
      deflate_len(lit("aaaa bbbb aaaa bbbb")),
      Similarity.lshBucket(array((0 until 64).map(_ => lit(0.25)): _*)))
    exprs.foreach { c =>
      val e = org.apache.spark.sql.GraftBridge.expression(c)
      assert(!e.isInstanceOf[CodegenFallback], s"CodegenFallback: $e")
    }
    // end-to-end: CODEGEN_ONLY forbids the interpreted-projection
    // fallback, so a compile error in any doGenCode would throw here
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = Seq(("a", "one two three four five six seven"))
        .toDF("id", "text")
        .select(col("id"),
          word_ngrams(filter(split(col("text"), "[^\\p{L}]+"), w => w =!= ""), 3).as("sh"))
        .select(col("id"), col("sh"),
          Dedup.minhashSignature(col("sh")).as("sig"))
        .select(col("id"),
          band_keys(col("sig"), 16, 8).as("bk"),
          simhash64(xxhash_array(col("sh"))).as("sh64"))
      assert(df.head().getSeq[Long](1).size == 16)
      val srp = Seq(Seq.fill(64)(0.25)).toDF("v")
        .select(Similarity.lshBucket(col("v")).as("b"),
          dot_product(col("v"), col("v")).as("dp"))
      val r = srp.head()
      assert(r.getDouble(1) == 64 * 0.25 * 0.25)
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("cdc_cuts kernel equals the HOF md5-window formulation the " +
      "oracle replays — ASCII fast path, multi-byte fallback, and " +
      "short-document edge cases") {
    import graft.functions.CatalystExprs.cdc_cuts
    val docs = Seq(
      "",
      "short",
      "exactly8",
      "exactly9!",
      ("the quick brown fox jumps over the lazy dog. " * 40),
      ("héllo wörld — ünïcode beyond ascii; " * 50),
      ("abc" * 300) // periodic text: many identical windows
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .filter(length(col("text")) >= 1)
    val hof = docs
      .withColumn("n", length(col("text")))
      .withColumn("cuts", expr(
        """filter(sequence(8, greatest(n, 8)),
          |  i -> i < n AND
          |    conv(substring(md5(substring(text, i - 7, 8)), 1, 6), 16, 10)
          |      % 64 = 0)""".stripMargin))
      .select(col("doc_id"), col("cuts"))
    val kern = docs.select(col("doc_id"), cdc_cuts(col("text")).as("cuts"))
    val h = hof.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val k = kern.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(h.keySet == k.keySet)
    h.foreach { case (id, cuts) =>
      assert(k(id) == cuts, s"doc $id: kernel ${k(id)} vs HOF $cuts")
    }
    // at least one non-trivial doc actually produced cuts, so the
    // equality above is not vacuous
    assert(h.values.exists(_.nonEmpty), "no cuts anywhere — weak corpus")
  }

  test("gram_stats kernel equals the explode+groupBy HOF formulation " +
      "the oracle replays — short docs, unicode, heavy repetition, " +
      "and the <2/<5-token edges") {
    import graft.functions.CatalystExprs.gram_stats
    val docs = Seq(
      "",                        // 0 tokens: absent from both forms
      "one",                     // 1 token: absent
      "two words",               // exactly one 2-gram, no 5-gram
      "a b c d",                 // 3 2-grams, no 5-gram
      "a b c d e",               // first 5-gram appears
      "x y x y x y x y x y",     // heavy 2-gram + 5-gram repetition
      ("héllo wörld " * 20).trim, // unicode, repeated bigram
      "a a a a a a a a",         // single-token runs
      ("the quick brown fox jumps over the lazy dog " * 10).trim
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def ws(c: org.apache.spark.sql.Column) =
      filter(split(c, "\\s+"), w => w =!= "")
    // the original HOF pipeline, verbatim
    val hof = docs
      .select(col("doc_id"), ws(col("text")).as("w"),
        explode(typedLit(Seq(2, 5))).as("n"))
      .select(col("doc_id"), col("n"),
        explode(when(size(col("w")) >= col("n"),
          transform(sequence(lit(1), size(col("w")) - col("n") + 1),
            i => array_join(slice(col("w"), i, col("n")), " ")))
          .otherwise(typedLit(Seq.empty[String]))).as("gram"))
      .groupBy("doc_id", "n", "gram").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id", "n")
      .agg(max(col("cnt")).as("top_cnt"), sum(col("cnt")).as("total"),
        sum(when(col("cnt") >= 2, col("cnt")).otherwise(lit(0)))
          .as("dup_cnt"))
      .groupBy("doc_id")
      .agg(coalesce(max(when(col("n") === 2, col("top_cnt"))), lit(0L))
          .as("top2"),
        coalesce(max(when(col("n") === 2, col("total"))), lit(0L))
          .as("total2"),
        coalesce(max(when(col("n") === 5, col("dup_cnt"))), lit(0L))
          .as("dup5"),
        coalesce(max(when(col("n") === 5, col("total"))), lit(0L))
          .as("total5"))
    val h = hof.collect().map(r => r.getLong(0) ->
      Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val k = docs.select(col("doc_id"), ws(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), gram_stats(col("w")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(h.keySet == k.keySet, s"doc sets differ: $h vs $k")
    h.foreach { case (id, exp) =>
      assert(k(id) == exp, s"doc $id: kernel ${k(id)} vs HOF $exp") }
    assert(h.values.exists(v => v(2) > 0), "no dup 5-grams — weak corpus")
  }

  test("sorted_pairs kernel equals the incidence self-join pair set " +
      "(a < b), empty below 2 elements") {
    import graft.functions.CatalystExprs.sorted_pairs
    val baskets = Seq(
      (1L, Seq(3L, 7L, 9L, 20L)),
      (2L, Seq(5L)),
      (3L, Seq[Long]()),
      (4L, Seq(1L, 2L))
    ).toDF("ok", "ps")
    val kern = baskets
      .select(col("ok"), explode(sorted_pairs(col("ps"))).as("pr"))
      .select(col("ok"), col("pr.a"), col("pr.b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val op = baskets.select(col("ok"), explode(col("ps")).as("pk"))
    val join = op.select(col("ok"), col("pk").as("a"))
      .join(op.select(col("ok"), col("pk").as("b")), "ok")
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(kern == join, s"kernel $kern vs self-join $join")
    assert(kern.size == 4 * 3 / 2 + 1)
  }

  test("minhash signature similarity approximates Jaccard (sanity)") {
    import graft.operators.Dedup
    // two 80%-overlapping shingle sets
    val s1 = (0 until 100).map(i => s"sh$i")
    val s2 = (20 until 120).map(i => s"sh$i")
    val df = Seq(("a", s1), ("b", s2)).toDF("id", "sh")
      .select(col("id"), Dedup.minhashSignature(col("sh")).as("sig"))
    val rows = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val agree = rows("a").zip(rows("b")).count { case (x, y) => x == y }
    val est = agree.toDouble / 128
    val trueJ = 80.0 / 120.0
    assert(math.abs(est - trueJ) < 0.15, s"minhash est $est vs true $trueJ")
  }
}
