package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.CatalystExprs._

/** SQL-surface registration of the custom Catalyst expressions, so
  * `spark.sql("SELECT simhash64(xxhash_array(...))")` works.
  *
  * Two entry points: `GraftExtensions` for
  * `spark.sql.extensions=graft.functions.GraftExtensions` at session
  * build (the cluster deployment path), and `register(spark)` for an
  * already-running session (tests, notebooks).
  */
object GraftFunctions {

  private def litInt(e: Expression): Int =
    e.asInstanceOf[Literal].value.asInstanceOf[Number].intValue()

  /** Constant numeric-array argument (e.g. `array(0.25, 0.5, 0.75)`)
    * evaluated at registration time — quantile probabilities are part
    * of the aggregate's shape, not data. SQL's natural spelling parses
    * those literals as DECIMAL, so the array is CAST to array<double>
    * before reading instead of assuming the element type.
    */
  private def litDoubles(e: Expression): Seq[Double] = {
    require(e.foldable, s"constant array expected, got $e")
    val numeric = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(et, _) =>
        et.isInstanceOf[org.apache.spark.sql.types.NumericType]
      case _ => false
    }
    require(numeric, s"constant NUMERIC array expected, got type ${e.dataType.sql}")
    org.apache.spark.sql.catalyst.expressions.Cast(e,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray().toSeq
  }

  /** Scalar custom expressions AND the sketch aggregates — the
    * analyzer wraps a registered `AggregateFunction` in its
    * `AggregateExpression` automatically, so `spark.sql("SELECT
    * theta_sketch(uid, 65536) ... GROUP BY ...")` just works.
    */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "word_ngrams" -> (es => WordNGrams(es.head, if (es.size > 1) litInt(es(1)) else 3)),
    "xxhash_array" -> (es => XxHashArray(es.head)),
    "simhash64" -> (es => SimHash64(es.head)),
    "dot_product" -> (es => DotProduct(es(0), es(1))),
    "band_keys" -> (es => BandKeys(es.head, litInt(es(1)), litInt(es(2)))),
    "md5_prefix_array" -> (es => Md5PrefixArray(es.head)),
    "band_key_strings" ->
      (es => BandKeyStrings(es.head, litInt(es(1)), litInt(es(2)))),
    "theta_sketch" -> (es => ThetaSketch(es.head, litInt(es(1)))),
    "theta_union" -> (es => ThetaUnion(es.head, litInt(es(1)))),
    "count_min" -> (es => CountMinSketch(es.head, litInt(es(1)), litInt(es(2)))),
    "bloom_filter" -> (es => BloomFilter(es.head, litInt(es(1)), litInt(es(2)))),
    "freq_items" -> (es => FreqItemsSketch(es.head, litInt(es(1)))),
    "kmv_sample" -> (es => KmvSample(es.head, litInt(es(1)))),
    "kll_quantiles" -> (es => KllSketch(es.head, litInt(es(1)), litDoubles(es(2)))))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

/** Session-extension hook: inject the graft SQL functions at session
  * construction (`.withExtensions(new GraftExtensions)` or the
  * `spark.sql.extensions` conf).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.CatalystExprs", name),
        builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
  }
}
