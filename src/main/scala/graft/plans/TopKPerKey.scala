package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Custom whole-operator extension (SURVEY §4, extension tier (c)):
  * per-key top-k as a first-class Catalyst operator —
  * LogicalPlan → Strategy → two-phase physical plan.
  *
  * Why not `row_number().over(window) <= k`? The window sorts every
  * row of every key (full sort + spill at 100 TB) and ships ALL rows
  * through the shuffle. This operator keeps a bounded k-row heap per
  * key per partition (memory O(keys·k)), ships ≤ k rows per key per
  * map partition through the shuffle, and merges heaps on the reduce
  * side — the same partial/final contract as Spark aggregation.
  *
  * The reference's analog is reduceF with per-key state
  * (common_reduce.go:16-103); this is that shape with bounded state.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: AttributeReference, child: LogicalPlan) extends UnaryNode {
  // rankAttr is a constructor param, NOT a val: plan copies made by
  // optimizer rules must keep the same exprId or downstream bindings
  // break with ATTRIBUTE_NOT_FOUND.
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyPlan =
    copy(child = c)
}

/** Shared heap logic: keep the k first rows w.r.t. `ord` per key. */
private[plans] object TopKHeaps {
  def partitionTopK(iter: Iterator[InternalRow], keyProj: UnsafeProjection,
      ord: Ordering[InternalRow], k: Int): mutable.HashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]] = {
    val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    // PriorityQueue is a max-heap: head = ord-largest = current k-th
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      heaps.get(key) match {
        case Some(h) =>
          if (h.size < k) h.enqueue(row.copy())
          else if (ord.lt(row, h.head)) { h.dequeue(); h.enqueue(row.copy()) }
        case None =>
          val h = mutable.PriorityQueue.empty[InternalRow](ord)
          h.enqueue(row.copy())
          heaps.put(key.copy(), h)
      }
    }
    heaps
  }
}

/** Map-side phase: emits at most k rows per key per input partition.
  * No distribution requirement — runs before any shuffle.
  */
case class TopKPerKeyPartialExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keys, child.output)
      val ord = RowOrdering.create(order, child.output)
      TopKHeaps.partitionTopK(iter, keyProj, ord, k)
        .valuesIterator.flatMap(_.iterator)
    }
  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyPartialExec =
    copy(child = c)
}

/** Reduce-side phase: requires clustering on the keys (Catalyst
  * inserts the exchange), merges the per-partition candidates, and
  * emits rows with their 1-based rank.
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: Attribute, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keys, child.output)
      val ord = RowOrdering.create(order, child.output)
      val toUnsafe = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      TopKHeaps.partitionTopK(iter, keyProj, ord, k)
        .valuesIterator.flatMap { h =>
          val sorted = h.dequeueAll.reverseIterator // PQ drains ord-desc
          sorted.zipWithIndex.map { case (row, i) =>
            toUnsafe(joined(row, new GenericInternalRow(Array[Any](i + 1L))))
          }
        }
    }
  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKeyPlan =>
      TopKPerKeyExec(t.keys, t.order, t.k, t.rankAttr,
        TopKPerKeyPartialExec(t.keys, t.order, t.k, planLater(t.child))) :: Nil
    case _ => Nil
  }
}

/** User-facing API. */
object TopKPerKey {
  /** Top-k rows per key group, ranked by `orderBy` (column name,
    * descending flag), deterministic via the caller-supplied
    * tiebreaker columns.
    */
  def apply(df: DataFrame, keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val keys = keyCols.map(attr)
    val order = orderBy.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    org.apache.spark.sql.GraftBridge.ofRows(spark,
      TopKPerKeyPlan(keys, order, k,
        AttributeReference("rnk", LongType, nullable = false)(), analyzed))
  }
}
