package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._

import graft.operators.TextMapReduce

/** Executor-side flag proving an injected failure actually fired.
  * Local mode runs executors in this JVM, so a static atomic is
  * visible to both the task and the assertion.
  */
object FaultInjector {
  val fired = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Fault-tolerance parity with the reference's Part IV
  * (src/mapreduce/test_test.go TestOneFailure/TestManyFailures,
  * schedule.go:17-31): a worker dying mid-task must not change the
  * job's output — the scheduler re-issues the task. Spark provides
  * exactly this via task re-attempts; these specs DEMONSTRATE it
  * instead of asserting it: a task throws on its first attempt (in
  * the map stage, then in the reduce stage) and the job must still
  * produce the identical wordcount. The test session runs with
  * `local[4, 2]` — 2 attempts per task — so the injected failure is
  * survivable, mirroring the lab's restarted workers.
  */
class FaultToleranceSpec extends SparkSpec {

  import spark.implicits._

  private def asPairs(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq

  private val docs = Tables.documents(spark, sf).select("text")
  private lazy val clean = asPairs(TextMapReduce.wordCountOver(docs))

  test("map-stage first-attempt failure: output identical after re-issue") {
    FaultInjector.fired.set(0)
    val failing = docs.as[String].mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
        FaultInjector.fired.incrementAndGet()
        throw new RuntimeException("injected first-attempt map failure")
      }
      it
    }.toDF("text")
    val survived = asPairs(TextMapReduce.wordCountOver(failing))
    assert(FaultInjector.fired.get() >= 1, "failure was never injected")
    assert(survived == clean, "map-task re-issue changed the result")
  }

  test("reduce-stage first-attempt failure: output identical after re-issue") {
    FaultInjector.fired.set(0)
    val failing = TextMapReduce.wordCountOver(docs)
      .as[(String, Long)]
      .mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
          FaultInjector.fired.incrementAndGet()
          throw new RuntimeException("injected first-attempt reduce failure")
        }
        it
      }
    val survived = failing.collect().sortBy(_._1).toSeq
    assert(FaultInjector.fired.get() >= 1, "failure was never injected")
    assert(survived == clean, "reduce-task re-issue changed the result")
  }
}
