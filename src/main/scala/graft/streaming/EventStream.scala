package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

import java.sql.Timestamp

/** Structured Streaming operators over the `events` stream shape
  * `(event_id, ts, user_id, event_type, value, props)`.
  *
  * The reference engine is fully batch (SURVEY §1.3 marks streaming
  * N/A), but a production training-data pipeline ingests event
  * streams; these are the idiomatic Spark mappings: watermarked
  * windowed aggregation and arbitrary-state sessionization via
  * `flatMapGroupsWithState`. Both run identically over
  * `spark.readStream` sources and (for tests/backfill) bounded
  * batch DataFrames — the transforms are source-agnostic.
  */
object EventStream {

  /** Tumbling-window event counts + value sums per event type, with a
    * watermark bounding state: late events beyond `lateness` are
    * dropped instead of growing state forever. */
  def windowedCounts(events: DataFrame, window_ : String = "10 minutes",
                     lateness: String = "5 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_c"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value_c"))

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Int,
                              sum_value: Double)

  /** Custom-state sessionization: a session closes after `gapMs` of
    * user inactivity. The state per user is O(1) — start/last/count/
    * sum — regardless of session length.
    *
    * Streaming (`flushTrailing = false`): open sessions stay in the
    * `GroupState` and close when a later batch shows a gap.
    * Batch/backfill (`flushTrailing = true`): no further batch will
    * come, so the trailing open session is emitted too.
    */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long = 600000L,
                 flushTrailing: Boolean = false): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    def flush(uid: Long, st: SessionState): SessionOut =
      SessionOut(uid, new Timestamp(st.start), new Timestamp(st.last), st.n, st.sum)

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
          val out = Vector.newBuilder[SessionOut]
          var st = state.getOption.orNull
          sorted.foreach { e =>
            val t = e.ts.getTime
            st match {
              case null =>
                st = SessionState(t, t, 1, e.value)
              case s if t - s.last > gapMs =>
                out += flush(uid, s)
                st = SessionState(t, t, 1, e.value)
              case s =>
                st = SessionState(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value)
            }
          }
          if (st != null) {
            if (flushTrailing) { out += flush(uid, st); state.remove() }
            else state.update(st)
          } else state.remove()
          out.result().iterator
      }
  }
}
