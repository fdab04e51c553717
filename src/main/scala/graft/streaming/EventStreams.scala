package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event operators
  * (SURVEY §2.G): the same logical computation as
  * `Relational.eventsHourly` / `Relational.sessionize`, expressed as
  * an unbounded plan with watermarks and keyed state.
  *
  * Transforms take a DataFrame so they run identically on
  * `readStream` sources and (for testing) on MemoryStream.
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Session bounds in epoch MICROseconds — `Timestamp.getTime` is
    * millis and would silently truncate event-time precision, making
    * streaming sessions diverge from the batch operator.
    */
  case class SessionState(start: Long, end: Long, n: Long)

  private def micros(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  /** Watermarked hourly tumbling-window aggregation. Late data beyond
    * 2 hours is dropped; state is bounded by (windows in watermark) ×
    * (event types) — safe for an unbounded run.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** Stream-stream interval join: each purchase joined to the same
    * user's clicks from the preceding hour. Both sides watermarked so
    * state is bounded; the time-range predicate lets Spark expire
    * click state once the watermark passes.
    */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "2 hours")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user")
        && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
        && col("c_ts") <= col("p_ts"))
  }

  /** Streaming exact dedup: drop repeated event_ids within the
    * watermark horizon — the streaming twin of `Dedup.exact`. State
    * is bounded by (ids seen inside the watermark window).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Event-time session windows with a 30-minute inactivity gap via
    * flatMapGroupsWithState. Sessions are emitted when the watermark
    * passes end+gap (event-time timeout), exactly mirroring the batch
    * gaps-and-islands result for closed sessions.
    */
  def sessionize(events: Dataset[Event],
      gapSec: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          val gapUs = gapSec * 1000000L
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, toTs(s.start), toTs(s.end), s.n))
          } else {
            val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.end <= gapUs =>
                  cur = Some(s.copy(end = math.max(s.end, t), n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(userId, toTs(s.start), toTs(s.end), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout API is millis; round up so it never fires early
              state.setTimeoutTimestamp((s.end + gapUs) / 1000 + 1)
            }
            closed.result().iterator
          }
        })
  }
}
