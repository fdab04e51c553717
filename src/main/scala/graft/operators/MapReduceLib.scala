package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Spark-native generalization of the reference's MapReduce contract.
  *
  * The reference (SidneyPrimas/MapReduce_MIT) runs user code through
  * two hooks — `mapF(file, contents) → [](k,v)` split across workers
  * by `ihash(key) % nReduce` (src/mapreduce/common_map.go:14-99) and
  * `reduceF(key, values) → out` applied per key after a grouped merge
  * (src/mapreduce/common_reduce.go:16-103). Its master re-issues
  * failed tasks (src/mapreduce/schedule.go) and merges reduce output
  * sorted by key (src/mapreduce/master_splitmerge.go).
  *
  * On Spark every piece of that machinery is subsumed: `flatMap` is
  * the map phase, `groupByKey` is the hash shuffle, `mapGroups` is the
  * reduce phase, lineage-based recomputation replaces task re-issue,
  * and a `sort` on the result reproduces the sorted merge. This object
  * keeps the reference's two-function API shape so a user of the
  * reference can port `mapF`/`reduceF` verbatim, while the execution
  * is a plain Catalyst plan (typed Dataset ops, one shuffle).
  *
  * For anything expressible as an algebraic aggregation prefer
  * `reduceByKeyAlg`, which gets map-side partial aggregation (the
  * MapReduce "combiner" the reference lacks) — at 100 TB the shuffle
  * volume difference between mapGroups (all pairs move) and a partial
  * agg (one row per key per partition moves) is decisive.
  */
object MapReduceLib {

  /** Direct analog of Sequential/Distributed(jobName, files, nReduce,
    * mapF, reduceF): full grouped reduce, values materialized per key.
    * Use only when reduceF genuinely needs all values at once.
    */
  def mapReduce[I, K: Encoder, V, O: Encoder](
      input: Dataset[I],
      mapF: I => IterableOnce[(K, V)],
      reduceF: (K, Iterator[V]) => O)(
      implicit kv: Encoder[(K, V)]): Dataset[O] =
    input
      .flatMap(mapF)(kv)
      .groupByKey(_._1)
      .mapGroups((k, it) => reduceF(k, it.map(_._2)))

  /** Combiner-enabled variant for associative+commutative reduceF —
    * Spark plans it as partial_agg → shuffle → final_agg, so only one
    * row per key per partition crosses the shuffle.
    */
  def reduceByKeyAlg[I, K: Encoder, V: Encoder](
      input: Dataset[I],
      mapF: I => IterableOnce[(K, V)],
      combine: (V, V) => V)(
      implicit kv: Encoder[(K, V)]): Dataset[(K, V)] =
    input
      .flatMap(mapF)(kv)
      .groupByKey(_._1)
      .mapValues(_._2)
      .reduceGroups(combine)
}
