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

  /** Streaming RETRANSMISSION dedup: an at-least-once source replays
    * whole events, so the dedup key is `event_id` PLUS the content
    * hash (a replay carries both unchanged; two legitimately distinct
    * events that happen to share (user, type, value) keep distinct
    * event_ids and are NOT collapsed — value-level collapsing is
    * `Dedup.exact`'s batch job, not ingest dedup's).
    * `dropDuplicatesWithinWatermark` keeps per-key state only until
    * the watermark passes it, so state is bounded by
    * (event rate × lateness), never by stream length. */
  def dedupWithinWatermark(events: DataFrame,
                           lateness: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("content_key",
        sha2(concat_ws("\u0000",
          col("event_id"), col("user_id"), col("event_type"), col("value")), 256))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("content_key")

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Int,
                              sum_value: Double)

  private def flush(uid: Long, st: SessionState): SessionOut =
    SessionOut(uid, new Timestamp(st.start), new Timestamp(st.last), st.n, st.sum)

  /** Custom-state sessionization: a session closes after `gapMs` of
    * user inactivity. The state per user is O(1) — start/last/count/
    * sum — regardless of session length.
    *
    * Streaming (`flushTrailing = false`): open sessions stay in the
    * `GroupState` and close when a later batch shows a gap. Each
    * micro-batch group IS buffered to sort it — bounded by the
    * micro-batch size, which the trigger controls.
    * Batch/backfill (`flushTrailing = true`): no further batch will
    * come; routed to [[sessionizeBatch]], which never buffers a
    * user's events (a mega-user in backfill would otherwise
    * materialize its entire history in one task).
    */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long = 600000L,
                 flushTrailing: Boolean = false): Dataset[SessionOut] = {
    if (flushTrailing) return sessionizeBatch(events, gapMs)
    val spark = events.sparkSession
    import spark.implicits._

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
          if (st != null) state.update(st) else state.remove()
          out.result().iterator
      }
  }

  /** Batch/backfill sessionization with BOUNDED memory: one shuffle on
    * user_id with an in-partition secondary sort on (user_id, ts,
    * value) — Spark's sort is external/spillable — then a single
    * streaming scan per partition holding only the current O(1)
    * session state. A user with a billion events costs zero extra
    * task memory, unlike any formulation that materializes the
    * per-user group (`rows.toSeq.sortBy`, collect_list, ...).
    * Same tie-break as the streaming path, so results agree. */
  def sessionizeBatch(events: Dataset[SessionEvent],
                      gapMs: Long = 600000L): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("value"))
      .as[SessionEvent]
      .mapPartitions { it =>
        new Iterator[SessionOut] {
          private var pending: SessionOut = _
          private var uid = 0L
          private var st: SessionState = _

          private def step(): Unit = {
            while (pending == null && it.hasNext) {
              val e = it.next()
              val t = e.ts.getTime
              if (st == null) {
                uid = e.user_id
                st = SessionState(t, t, 1, e.value)
              } else if (e.user_id != uid) {
                pending = flush(uid, st)
                uid = e.user_id
                st = SessionState(t, t, 1, e.value)
              } else if (t - st.last > gapMs) {
                pending = flush(uid, st)
                st = SessionState(t, t, 1, e.value)
              } else {
                st = SessionState(st.start, math.max(st.last, t), st.n + 1, st.sum + e.value)
              }
            }
            if (pending == null && st != null) { // trailing open session
              pending = flush(uid, st)
              st = null
            }
          }

          override def hasNext: Boolean = { step(); pending != null }
          override def next(): SessionOut = {
            step()
            val r = pending
            pending = null
            r
          }
        }
      }
  }
}
