package graft

import graft.streaming.StreamOps

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

case class QDoc(doc_id: Long, src: String)

case class PDoc(doc_id: Long, lang: String, text: String)

/** Structured Streaming tests (SURVEY §5.6): the sketch aggregate as
  * streaming state, watermark-governed lateness, session windows, stream
  * dedup. MemoryStream drives micro-batches synchronously. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  private def t(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed approx_distinct over a stream, update mode") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val agg = StreamOps.windowedApproxDistinct(
      mem.toDF(), "ts", "event_type", "user_id", "10 minutes")
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("wad").start()
    try {
      mem.addData(Ev(t(1), 1, "click", 1.0), Ev(t(2), 2, "click", 1.0),
        Ev(t(3), 1, "click", 1.0), Ev(t(4), 3, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(t(5), 4, "click", 1.0), Ev(t(12), 1, "click", 1.0))
      q.processAllAvailable()
      // update mode re-emits rows per batch: keep the latest (max) per key
      val rows = spark.sql(
        """SELECT window_start, event_type, MAX(n_distinct) AS n
          |FROM wad GROUP BY window_start, event_type""".stripMargin)
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      // window 10:00-10:10 click: users {1,2,4} = 3 (sketch state merged across batches)
      assert(rows((t(0), "click")) == 3L)
      assert(rows((t(0), "view")) == 1L)
      assert(rows((t(10), "click")) == 1L)
    } finally q.stop()
  }

  test("windowed dd_quantiles over a stream EQUALS the batch twin exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = StreamOps.windowedQuantiles(mem.toDF(), "ts", "event_type",
        "value", "10 minutes", Seq(0.5, 0.99))
      .writeStream.outputMode("update").format("memory")
      .queryName("wdq").start()
    val evs = (1 to 40).map(i =>
      Ev(t(i % 18), (i % 5).toLong, if (i % 2 == 0) "click" else "view",
        math.exp(i % 13)))
    try {
      // two micro-batches: sketch state must merge across them
      mem.addData(evs.take(25): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(25): _*)
      q.processAllAvailable()
      // update mode re-emits per batch; the LAST row per key is current.
      // DDSketch merges are exact, so streaming state == batch one-shot
      // BIT-IDENTICALLY, not within an envelope.
      val streamed = spark.sql(
        """SELECT window_start, event_type, qs FROM (
          |  SELECT *, row_number() OVER (
          |    PARTITION BY window_start, event_type
          |    ORDER BY __batch DESC) AS rn FROM (
          |    SELECT *, monotonically_increasing_id() AS __batch FROM wdq))
          |WHERE rn = 1""".stripMargin)
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getSeq[Double](2))
        .toMap
      val batch = StreamOps.windowedQuantiles(evs.toDF(), "ts",
          "event_type", "value", "10 minutes", Seq(0.5, 0.99))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getSeq[Double](2))
        .toMap
      assert(streamed == batch)
      assert(batch.nonEmpty && batch.keySet.map(_._2) == Set("click", "view"))
    } finally q.stop()
  }

  test("sliding windows: each event lands in every overlapping window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = StreamOps.windowedApproxDistinct(
        mem.toDF(), "ts", "event_type", "user_id", "10 minutes",
        slide = Some("5 minutes"))
      .writeStream.outputMode("update").format("memory").queryName("slide").start()
    try {
      mem.addData(Ev(t(7), 1, "click", 1.0), Ev(t(8), 2, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window_start, MAX(n_distinct) FROM slide GROUP BY 1 ORDER BY 1")
        .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toSeq
      // events at 10:07/10:08 belong to [10:00,10:10) and [10:05,10:15)
      assert(rows == Seq(t(0) -> 2L, t(5) -> 2L), s"got $rows")
    } finally q.stop()
  }

  test("windowed top-k over a stream: summaries merge across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = StreamOps.windowedTopK(mem.toDF(), "ts", "event_type",
        "10 minutes", k = 2, capacity = 64)
      .select(col("window_start"), explode(col("topk")).as("e"))
      .select(col("window_start"), col("e.item"), col("e.est"))
      .writeStream.outputMode("complete").format("memory").queryName("wtk").start()
    try {
      mem.addData(Ev(t(1), 1, "click", 1.0), Ev(t(2), 2, "click", 1.0),
        Ev(t(3), 3, "view", 1.0))
      q.processAllAvailable()
      // second batch flips the leader WITHIN the same window: the windowed
      // summary must have merged state, not per-batch counts
      mem.addData(Ev(t(4), 4, "view", 1.0), Ev(t(5), 5, "view", 1.0),
        Ev(t(12), 6, "scroll", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT item, est FROM wtk WHERE window_start = TIMESTAMP '2024-01-01 10:00:00' ORDER BY est DESC, item")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      assert(rows == Seq("view" -> 3L, "click" -> 2L), s"got $rows")
      val w2 = spark.sql(
        "SELECT item, est FROM wtk WHERE window_start = TIMESTAMP '2024-01-01 10:10:00'")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      assert(w2 == Seq("scroll" -> 1L), s"got $w2")
    } finally q.stop()
  }

  test("watermark drops late rows beyond the horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val agg = StreamOps.windowedApproxDistinct(
      mem.toDF(), "ts", "event_type", "user_id", "10 minutes",
      watermark = Some("5 minutes"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm").start()
    try {
      mem.addData(Ev(t(1), 1, "click", 1.0), Ev(t(2), 2, "click", 1.0))
      q.processAllAvailable()
      // advance event time far => watermark passes the first window
      mem.addData(Ev(t(40), 9, "click", 1.0))
      q.processAllAvailable()
      // this row is way behind the watermark: must be dropped
      mem.addData(Ev(t(3), 3, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(t(59), 9, "click", 1.0))
      q.processAllAvailable()
      val closed = spark.sql("SELECT n_distinct FROM wm WHERE window_start = TIMESTAMP '2024-01-01 10:00:00'")
        .collect().map(_.getLong(0))
      assert(closed.sameElements(Array(2L)), s"late row leaked: ${closed.mkString(",")}")
    } finally q.stop()
  }

  test("running distinct via mapGroupsWithState accumulates across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val run = StreamOps.runningApproxDistinct(
      mem.toDF(), "event_type", "user_id", algo = "lc", precision = 65536)
    val q = run.writeStream.outputMode("update")
      .format("memory").queryName("rad").start()
    try {
      mem.addData(Ev(t(1), 1, "click", 1.0), Ev(t(2), 2, "click", 1.0),
        Ev(t(3), 1, "click", 1.0))
      q.processAllAvailable()
      val batch1 = spark.sql("SELECT MAX(n_distinct) FROM rad WHERE event_type = 'click'")
        .head().getLong(0)
      assert(batch1 == 2L) // users {1, 2}
      // second batch: one repeat user, two new — STATE must carry {1, 2} over
      mem.addData(Ev(t(9), 1, "click", 1.0), Ev(t(10), 7, "click", 1.0),
        Ev(t(11), 8, "click", 1.0), Ev(t(12), 9, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT event_type, MAX(n_distinct) AS n FROM rad GROUP BY event_type")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows("click") == 4L) // {1, 2, 7, 8} — lifetime, not per-batch
      assert(rows("view") == 1L)
    } finally q.stop()
  }

  test("streaming funnel equals the batch funnel on a time-ordered two-batch replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
      .orderBy("ts")
      .as[Ev].collect()
    val split = ev.length / 2
    val mem = MemoryStream[Ev]
    val run = StreamOps.streamingFunnel(mem.toDF(), "ts", "user_id",
      "event_type", Seq("view", "click", "purchase"), horizonSeconds = 24 * 3600L)
    val q = run.writeStream.outputMode("update")
      .format("memory").queryName("sfun").start()
    try {
      mem.addData(ev.take(split).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(ev.drop(split).toIndexedSeq)
      q.processAllAvailable()
      // last update per user is the final chain state (monotone)
      val streamed = spark.sql(
        """SELECT s.steps_reached, COUNT(*) AS n FROM (
          |  SELECT user_id, MAX(steps_reached) AS steps_reached
          |  FROM sfun GROUP BY user_id) s
          |GROUP BY s.steps_reached""".stripMargin)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      def reachedAtLeast(k: Int) =
        streamed.filter(_._1 >= k).values.sum
      val batch = graft.operators.Behavior.funnelCounts(
        graft.sources.Tables.events(spark, sf), "ts", "user_id", "event_type",
        Seq("view", "click", "purchase"), horizonSeconds = 24 * 3600L)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert((1 to 3).map(reachedAtLeast) == (1 to 3).map(batch(_)),
        s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("streaming last-touch attribution equals the batch operator on an ordered replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val evDf = graft.sources.Tables.events(spark, sf)
    case class EvId(ts: Timestamp, user_id: Long, event_type: String, event_id: Long)
    val ev = evDf.select(col("ts"), col("user_id"), col("event_type"), col("event_id"))
      .orderBy("ts", "event_id")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val split = ev.length / 2
    val mem = MemoryStream[(Timestamp, Long, String, Long)]
    val run = StreamOps.streamingLastTouch(
      mem.toDF().toDF("ts", "user_id", "event_type", "event_id"),
      "ts", "user_id", "event_type", Seq("view", "click"), "purchase",
      windowSeconds = 6 * 3600L, tieCol = "event_id")
    val q = run.writeStream.outputMode("update")
      .format("memory").queryName("slt").start()
    try {
      mem.addData(ev.take(split).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(ev.drop(split).toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT user_id, conv_us, touch_type FROM slt")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sorted.toSeq
      val batch = graft.operators.Behavior.lastTouchAttribution(evDf, "ts",
          "user_id", "event_type", Seq("view", "click"), "purchase",
          windowSeconds = 6 * 3600L, tiebreakCol = "event_id")
        .select(col("user_id"), expr("unix_micros(ts)"), col("touch_type"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sorted.toSeq
      assert(streamed == batch,
        s"streamed ${streamed.size} rows, batch ${batch.size}; first diff: " +
          streamed.zip(batch).find { case (a, b) => a != b })
    } finally q.stop()
  }

  test("streaming drift monitor: in-distribution batch quiet, shifted batch loud, replay overwrites") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    // baseline: uniform on [0, 10) for key "e"
    val baseRows = (0 until 100).map(i => ("e", i / 10.0)).toDF("k", "v")
    val baseline = graft.operators.Audit.bucketCounts(baseRows, "k", "v",
      lo = 0.0, hi = 10.0, nBuckets = 20)
    val mem = MemoryStream[Ev]
    val q = StreamOps.streamingDriftMonitor(
      mem.toDF().select(col("event_type"), col("value")),
      "event_type", "value", baseline, lo = 0.0, hi = 10.0, nBuckets = 20,
      path = dir)
    try {
      // batch 0: same uniform shape -> small D
      mem.addData((0 until 100).map(i => Ev(t(1), i.toLong, "e", i / 10.0)): _*)
      q.processAllAvailable()
      // batch 1: everything piled at the top of the range -> large D
      mem.addData((0 until 100).map(i => Ev(t(2), i.toLong, "e", 9.5)): _*)
      q.processAllAvailable()
    } finally q.stop()
    def report(b: Long): Double =
      spark.read.parquet(dir).filter(col("batch_id") === b)
        .select("ks_distance").head().getDouble(0)
    assert(report(0L) < 0.05, s"in-distribution batch drifted: ${report(0L)}")
    assert(report(1L) > 0.5, s"shifted batch must alarm: ${report(1L)}")
    // replay batch 1 via the same body: report overwritten, not duplicated
    val counts = graft.operators.Audit.bucketCounts(
      (0 until 100).map(i => ("e", 9.5)).toDF("k", "v"), "k", "v",
      0.0, 10.0, 20)
    StreamOps.idempotentBatchWrite(
      graft.operators.Audit.ksCompare(counts, baseline, 20), dir, 1L)
    assert(spark.read.parquet(dir).filter(col("batch_id") === 1L).count() == 1L)
    assert(report(1L) > 0.5)
  }

  test("TTL-state streaming dedup emits only first-seen content across restarts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val base = java.nio.file.Files.createTempDirectory("graft-ttl").toString
    val mem = MemoryStream[Ev]
    // AvailableNow: process what's queued, then terminate — bounded batches.
    // foreachBatch parquet sink: fault-tolerant, so state recovers (memory
    // sink refuses checkpoint recovery by design)
    def runOnce(): Unit = {
      val dedup = StreamOps.streamingDedupTtl(
        mem.toDF(), Seq("user_id", "event_type"), java.time.Duration.ofHours(1))
      val q = dedup.writeStream.outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.write.mode("append").parquet(s"$base/out")
        }
        .start()
      try q.awaitTermination(120000) finally q.stop()
    }
    try {
      mem.addData(Ev(t(1), 1, "click", 1.0), Ev(t(2), 1, "click", 2.0),
        Ev(t(3), 2, "click", 1.0))
      runOnce()
      // restart from the checkpoint: repeats of run-1 keys must be dropped
      // by RECOVERED state, not batch-local dedup
      mem.addData(Ev(t(9), 1, "click", 9.0), Ev(t(10), 2, "view", 1.0))
      runOnce()
      val rows = spark.read.parquet(s"$base/out")
        .select("user_id", "event_type", "value")
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(rows.size == 3, s"expected 3 first-seen rows, got $rows")
      assert(rows((1L, "click")) == 1.0) // the FIRST of the duplicates
      assert(rows((2L, "click")) == 1.0)
      assert(rows((2L, "view")) == 1.0)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-stream interval join matches pairs within the time bound") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Ev]
    val views = MemoryStream[Ev]
    val joined = StreamOps.intervalJoin(
      clicks.toDF().select($"user_id", $"ts"),
      views.toDF().select($"user_id", $"ts"),
      "user_id", "ts", before = "0 seconds", after = "10 minutes",
      watermark = Some("30 minutes"))
    val q = joined.select($"l_user_id", $"l_ts", $"r_ts")
      .writeStream.outputMode("append").format("memory").queryName("ssj").start()
    try {
      clicks.addData(Ev(t(1), 1, "click", 1.0), Ev(t(20), 2, "click", 1.0))
      views.addData(Ev(t(5), 1, "view", 1.0))
      q.processAllAvailable()
      // second batch: a view for user 2 inside its click's window, a view
      // for user 1 OUTSIDE the 10-minute bound, and a keyless view
      views.addData(Ev(t(25), 2, "view", 1.0), Ev(t(30), 1, "view", 1.0),
        Ev(t(7), 9, "view", 1.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT l_user_id, r_ts FROM ssj ORDER BY l_user_id")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
      assert(got == Seq((1L, t(5)), (2L, t(25))), s"got $got")
    } finally q.stop()
  }

  test("sessionize groups events by inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = StreamOps.sessionize(mem.toDF(), "ts", "user_id", "5 minutes")
      .writeStream.outputMode("complete").format("memory").queryName("sess").start()
    try {
      // user 1: events at 10:01,10:03,10:05 (one session) and 10:30 (another)
      mem.addData(Ev(t(1), 1, "a", 1.0), Ev(t(3), 1, "a", 2.0),
        Ev(t(5), 1, "a", 3.0), Ev(t(30), 1, "a", 4.0))
      q.processAllAvailable()
      val sess = spark.sql("SELECT n_events FROM sess WHERE user_id = 1 ORDER BY session_start")
        .collect().map(_.getLong(0)).toSeq
      assert(sess == Seq(3L, 1L), s"sessions: $sess")
    } finally q.stop()
  }

  test("sketch store sink: incremental store-then-merge equals one pass") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import GraftFunctions._
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val mem = MemoryStream[Ev]
    val q = StreamOps.sketchStoreSink(mem.toDF(), "ts", "event_type", "user_id",
      "10 minutes", s"$dir/sketches")
    try {
      mem.addData(Ev(t(1), 1, "click", 1.0), Ev(t(2), 2, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(t(3), 3, "click", 1.0), Ev(t(4), 1, "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    // the store holds one sketch row per (batch, window, key) — re-aggregate
    val merged = spark.read.parquet(s"$dir/sketches")
      .filter($"event_type" === "click")
      .agg(approx_distinct($"sk").as("d"))
      .select($"d.cardinality").as[Long].head()
    assert(merged == 3L, s"store-then-merge got $merged, expected 3 distinct users")
  }

  test("sketch state survives a checkpointed restart") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import GraftFunctions._
    val base = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val mem = MemoryStream[Ev]
    // foreachBatch sink: fault-tolerant, so state recovers (memory sink
    // refuses checkpoint recovery by design)
    def startQuery() = StreamOps.sketchStoreSink(mem.toDF(), "ts", "event_type",
      "user_id", "10 minutes", s"$base/store", checkpoint = Some(s"$base/ckpt"))

    val q1 = startQuery()
    mem.addData(Ev(t(1), 1, "click", 1.0), Ev(t(2), 2, "click", 1.0))
    q1.processAllAvailable()
    q1.stop()

    // restart from the checkpoint: prior sketch state must be recovered so
    // user 1 is not a new distinct and user 3 extends the same window sketch
    val q2 = startQuery()
    mem.addData(Ev(t(3), 1, "click", 1.0), Ev(t(4), 3, "click", 1.0))
    q2.processAllAvailable()
    q2.stop()

    val n = spark.read.parquet(s"$base/store")
      .filter($"window_start" === t(0))
      .agg(approx_distinct($"sk").as("d")).select($"d.cardinality").as[Long].head()
    assert(n == 3L, s"state lost or duplicated across restart: n=$n")
  }

  test("replayed batch overwrites its own partition: HLL and SpaceSaving stores unchanged") {
    import spark.implicits._
    import GraftFunctions._
    val dir = java.nio.file.Files.createTempDirectory("graft-replay").toString
    // two batches of per-window summaries, as the sinks would emit them
    val b0 = Seq((t(0), "click", Seq("u1", "u2")), (t(0), "view", Seq("u1")))
    val b1 = Seq((t(10), "click", Seq("u2", "u3")))
    def summarize(rows: Seq[(java.sql.Timestamp, String, Seq[String])]) =
      rows.flatMap { case (w, k, us) => us.map((w, k, _)) }
        .toDF("window_start", "event_type", "user_id")
        .groupBy("window_start", "event_type")
        .agg(approx_distinct($"user_id").as("sk"),
          graft.GraftFunctions.topk_sketch_agg($"user_id", 16).as("tk"))
    graft.streaming.StreamOps.idempotentBatchWrite(summarize(b0), dir, 0L)
    graft.streaming.StreamOps.idempotentBatchWrite(summarize(b1), dir, 1L)
    def readBack(): (Long, Seq[(String, Long)]) = {
      val store = spark.read.parquet(dir)
      val hll = store.agg(approx_distinct($"sk").as("d"))
        .select($"d.cardinality").as[Long].head()
      val topk = store.agg(topk_merge_agg($"tk", 5, 16).as("tk"))
        .select(explode($"tk").as("e"))
        .select($"e.item", $"e.est").as[(String, Long)].collect().toSeq
      (hll, topk)
    }
    val before = readBack()
    assert(before._1 == 3L, s"distinct users: ${before._1}")
    assert(before._2 == Seq(("u1", 2L), ("u2", 2L), ("u3", 1L)), before._2.toString)
    // failure replay: the SAME batch id written again — additive SpaceSaving
    // counts must NOT double
    graft.streaming.StreamOps.idempotentBatchWrite(summarize(b1), dir, 1L)
    assert(readBack() == before, "replayed batch changed the store")
  }

  test("topk store sink: append-once windows re-aggregate to one-pass counts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import GraftFunctions._
    val dir = java.nio.file.Files.createTempDirectory("graft-topk-store").toString
    val mem = MemoryStream[Ev]
    val q = graft.streaming.StreamOps.topkStoreSink(mem.toDF(), "ts", "event_type",
      "10 minutes", s"$dir/store", watermark = "5 minutes", capacity = 64)
    try {
      mem.addData(Ev(t(1), 1, "click", 1.0), Ev(t(2), 2, "click", 1.0),
        Ev(t(3), 3, "view", 1.0))
      q.processAllAvailable()
      // advance the watermark past the first window's end (10:10 + 5m)
      mem.addData(Ev(t(16), 4, "scroll", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(t(17), 5, "scroll", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val store = spark.read.parquet(s"$dir/store")
    // exactly one row for the finalized first window, counts exact
    assert(store.filter($"window_start" === t(0)).count() == 1L)
    val top = store.filter($"window_start" === t(0))
      .agg(topk_merge_agg($"sk", 5, 64).as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.item", $"e.est").as[(String, Long)].collect().toSeq
    assert(top == Seq(("click", 2L), ("view", 1L)), top.toString)
  }

  test("running top-k via mapGroupsWithState accumulates across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = graft.streaming.StreamOps
      .runningTopK(mem.toDF(), "event_type", "user_id", k = 3, capacity = 64)
      .writeStream.outputMode("update").format("memory").queryName("rtopk").start()
    try {
      mem.addData(Ev(t(1), 1, "click", 1.0), Ev(t(2), 1, "click", 1.0),
        Ev(t(3), 2, "click", 1.0))
      q.processAllAvailable()
      // second batch extends the SAME lifetime state: user 2 overtakes
      mem.addData(Ev(t(4), 2, "click", 1.0), Ev(t(5), 2, "click", 1.0))
      q.processAllAvailable()
      val top = spark.sql(
        """SELECT e.item, e.est FROM (
          |  SELECT explode(topk) AS e FROM rtopk WHERE event_type = 'click')""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      // update-mode memory sink appends each batch's emission; only the
      // second emission can know user 2's lifetime count of 3
      assert(top.contains(("2", 3L)), s"got $top")
      assert(top.contains(("1", 2L)), s"got $top")
    } finally q.stop()
  }

  test("cm store sink: append-once windows re-aggregate to probeable one-pass counts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import GraftFunctions._
    val dir = java.nio.file.Files.createTempDirectory("graft-cm-store").toString
    val mem = MemoryStream[Ev]
    val q = graft.streaming.StreamOps.cmStoreSink(mem.toDF(), "ts", "event_type",
      "10 minutes", s"$dir/store", watermark = "5 minutes", width = 256, depth = 5)
    try {
      mem.addData(Ev(t(1), 1, "click", 1.0), Ev(t(2), 2, "click", 1.0),
        Ev(t(3), 3, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(t(16), 4, "scroll", 1.0)) // watermark past window 1
      q.processAllAvailable()
      mem.addData(Ev(t(17), 5, "scroll", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val est = spark.read.parquet(s"$dir/store")
      .filter($"window_start" === t(0))
      .agg(cm_merge_agg($"sk").as("sk"))
      .select(cm_estimate($"sk", lit("click")).as("c"),
        cm_estimate($"sk", lit("view")).as("v")).head()
    assert((est.getLong(0), est.getLong(1)) == ((2L, 1L)), est.toString)
  }

  test("theta store sink: cumulative snapshots re-aggregate idempotently") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import GraftFunctions._
    val dir = java.nio.file.Files.createTempDirectory("graft-theta-store").toString
    val mem = MemoryStream[Ev]
    val q = graft.streaming.StreamOps.thetaStoreSink(mem.toDF(), "ts", "event_type",
      "user_id", "10 minutes", s"$dir/store")
    try {
      mem.addData(Ev(t(1), 1, "click", 1.0), Ev(t(2), 2, "click", 1.0))
      q.processAllAvailable()
      // batch 2 re-emits the window's cumulative sketch (update mode);
      // theta union is idempotent so merging both snapshots stays correct
      mem.addData(Ev(t(3), 3, "click", 1.0), Ev(t(4), 1, "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val est = spark.read.parquet(s"$dir/store")
      .filter($"event_type" === "click")
      .agg(theta_estimate(theta_merge_agg($"sk")).as("est"))
      .as[Long].head()
    assert(est == 3L, s"theta store-then-merge got $est, expected 3 distinct users")
  }

  test("streaming near-dup ingest: intra-batch + corpus dedup, index grows across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    spark.sql("DROP TABLE IF EXISTS si_bands")
    spark.sql("DROP TABLE IF EXISTS si_shingles")
    // seed corpus: two known documents
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    graft.operators.Dedup.writeMinhashIndex(corpus, "doc_id", "text", "si", wh)

    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.streamingNearDupIngest(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", "si", wh, s"$wh/kept")
    try {
      // batch 0: 10 = dup of corpus doc 1, 11+12 = intra-batch dups of each
      // other, 13 = genuinely new
      mem.addData(
        (10L, "alpha beta gamma delta epsilon zeta eta theta"),
        (11L, "red orange yellow green blue indigo violet colors"),
        (12L, "red orange yellow green blue indigo violet colors"),
        (13L, "completely novel content about spark execution plans"))
      q.processAllAvailable()
      val kept0 = spark.read.parquet(s"$wh/kept")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(kept0 == Seq(11L, 13L), s"batch 0 kept $kept0")
      // batch 1: a dup of batch 0's survivor must now hit the GROWN index
      mem.addData(
        (20L, "red orange yellow green blue indigo violet colors"),
        (21L, "another genuinely fresh document body entirely"))
      q.processAllAvailable()
      val kept1 = spark.read.parquet(s"$wh/kept")
        .filter(col("batch_id") === 1L)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(kept1 == Seq(21L), s"batch 1 kept $kept1")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS si_bands")
      spark.sql("DROP TABLE IF EXISTS si_shingles")
    }
  }

  test("streaming decontamination: leaks quarantined with evidence, clean docs kept, replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-decontam-s").toString
    spark.sql("DROP TABLE IF EXISTS sd_evalwins")
    val evalSet = Seq(
      (900L, "what is the capital of france and when was it founded exactly"),
      (901L, "solve for x in the equation two x plus seven equals nineteen")
    ).toDF("doc_id", "text")
    graft.operators.Dedup.writeEvalWindowIndex(evalSet, "doc_id", "text", "sd", wh)

    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.streamingDecontaminate(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", "sd",
      s"$wh/kept", s"$wh/quarantine")
    try {
      mem.addData(
        (10L, "prefix what is the capital of france and when was it founded exactly suffix"),
        (11L, "a perfectly clean training document about distributed joins"))
      q.processAllAvailable()
      val quarantined = spark.read.parquet(s"$wh/quarantine")
        .select("doc_id", "n_eval_docs", "max_shared")
        .as[(Long, Long, Long)].collect().toSeq
      assert(quarantined.map(_._1) == Seq(10L), quarantined.toString)
      assert(quarantined.head._2 == 1L && quarantined.head._3 >= 1L)
      val kept = spark.read.parquet(s"$wh/kept")
        .select("doc_id").as[Long].collect().toSeq
      assert(kept == Seq(11L), kept.toString)

      // a second batch, then verify per-batch isolation
      mem.addData((20L, "more clean content in a later micro batch"))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$wh/kept").count() == 2L)
      assert(spark.read.parquet(s"$wh/quarantine").count() == 1L)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sd_evalwins")
    }
  }

  test("stream-static bm25: micro-batches score against frozen corpus stats") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // freeze the stats from a static corpus once
    val corpus = Seq((1L, "cat cat dog"), (2L, "cat fish fish"), (3L, "bird bird"))
      .toDF("doc_id", "text")
    val terms = Seq("cat", "dog")
    val stats = graft.operators.TextAnalysis
      .bm25CorpusStats(corpus, "doc_id", "text", terms)
    // score a stream of incoming docs against them (stateless stream-static
    // broadcast join — the ingest-relevance-gate shape)
    val mem = MemoryStream[(Long, String)]
    val scored = graft.operators.TextAnalysis.bm25SearchWithStats(
      mem.toDF().toDF("doc_id", "text"), stats, "doc_id", "text", terms)
    val q = scored.writeStream.format("memory").queryName("bm25_stream")
      .outputMode("append").start()
    try {
      mem.addData((9L, "cat dog dog"), (10L, "nothing relevant here"))
      q.processAllAvailable()
      mem.addData((11L, "cat"))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, n_match_terms, score FROM bm25_stream")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      // batch twin over the same rows must agree row-for-row
      val twin = graft.operators.TextAnalysis.bm25SearchWithStats(
          Seq((9L, "cat dog dog"), (10L, "nothing relevant here"), (11L, "cat"))
            .toDF("doc_id", "text"), stats, "doc_id", "text", terms)
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(got == twin && got.map(_._1) == Seq(9L, 11L), s"got $got")
    } finally q.stop()
  }

  test("stream-static PC1: micro-batches score against a frozen model, equals batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // freeze the model on a static reference corpus
    val corpus = Seq((1L, Array(1f, 2f)), (2L, Array(2f, 1f)),
      (3L, Array(3f, 4f)), (4L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val model = graft.operators.Similarity.pcaFit(corpus, "vec_id",
      "embedding", dim = 2, iters = 4)
    // score an incoming vector stream with the stateless projection column
    val mem = MemoryStream[(Long, Array[Float])]
    val scored = mem.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"),
        graft.operators.Similarity.pc1ScoreColumn(col("embedding"), model)
          .as("pc1_score"))
    val q = scored.writeStream.format("memory").queryName("pc1_stream")
      .outputMode("append").start()
    try {
      mem.addData((9L, Array(5f, 5f)), (10L, Array(-1f, 0f)))
      q.processAllAvailable()
      mem.addData((11L, Array(0f, 0f)))
      q.processAllAvailable()
      val got = spark.sql("SELECT vec_id, pc1_score FROM pc1_stream")
        .as[(Long, Double)].collect().sortBy(_._1).toSeq
      val twin = Seq((9L, Array(5f, 5f)), (10L, Array(-1f, 0f)),
          (11L, Array(0f, 0f))).toDF("vec_id", "embedding")
        .select(col("vec_id"),
          graft.operators.Similarity.pc1ScoreColumn(col("embedding"), model)
            .as("pc1_score"))
        .as[(Long, Double)].collect().sortBy(_._1).toSeq
      assert(got == twin && got.map(_._1) == Seq(9L, 10L, 11L), s"got $got")
    } finally q.stop()
  }

  test("streaming chunking: the stateless projection runs per-batch in append mode") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val chunks = graft.operators.TextAnalysis.chunkTokens(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", 4, 3)
    val q = chunks.writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, "a b c d e f"), (2L, "x y"))
      q.processAllAvailable()
      mem.addData((3L, "p q r s t"))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT doc_id, chunk_idx, chunk_text FROM chunk_stream ORDER BY doc_id, chunk_idx")
        .as[(Long, Long, String)].collect().toSeq
      val twin = graft.operators.TextAnalysis.chunkTokens(
          Seq((1L, "a b c d e f"), (2L, "x y"), (3L, "p q r s t"))
            .toDF("doc_id", "text"), "doc_id", "text", 4, 3)
        .select("doc_id", "chunk_idx", "chunk_text")
        .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got == twin, s"stream $got vs batch $twin")
    } finally q.stop()
  }

  test("streaming LM ingest: per-batch counts sum to the one-shot model; replay overwrites") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-ingest").toString
    val b1 = Seq((1L, "a b a b"), (2L, "a b c"))
    val b2 = Seq((3L, "c a b"), (4L, "b c"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.streamingLmIngest(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", dir)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    def modelTriple(bg: org.apache.spark.sql.DataFrame,
        mg: org.apache.spark.sql.DataFrame, v: org.apache.spark.sql.DataFrame) =
      (bg.as[(String, Long)].collect().toMap,
        mg.as[(String, Long)].collect().toMap,
        v.as[Long].head())
    val (sb, sm, sv) = StreamOps.readLmModelStore(spark, dir)
    val (ob, om, ov) = graft.operators.TextAnalysis.lmFitModel(
      (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text")
    assert(modelTriple(sb, sm, sv) == modelTriple(ob, om, ov),
      "streamed model diverged from the one-shot fit")

    // scoring through the streamed store equals scoring through the
    // one-shot model, row for row
    val probe = Seq((9L, "a b c"), (10L, "z z")).toDF("doc_id", "text")
    val viaStore = graft.operators.TextAnalysis.lmScoreWithModel(
        probe, "doc_id", "text", sb, sm, sv)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val viaFit = graft.operators.TextAnalysis.lmScoreWithModel(
        probe, "doc_id", "text", ob, om, ov)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(viaStore == viaFit, s"store $viaStore vs fit $viaFit")

    // failure replay: batch 0 again — overwrites its partition, sums unchanged
    val before = modelTriple(sb, sm, sv)
    val (bg1, _, _) = graft.operators.TextAnalysis.lmFitModel(
      b1.toDF("doc_id", "text"), "doc_id", "text")
    StreamOps.idempotentBatchWrite(bg1, s"$dir/bigrams", 0L)
    val (rb, rm, rv) = StreamOps.readLmModelStore(spark, dir)
    assert(modelTriple(rb, rm, rv) == before, "replayed batch changed the model")
  }

  test("stream-static LM: micro-batches score against a frozen persisted model; unseen floors") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "c a"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-model").toString
    graft.operators.TextAnalysis.lmWriteModel(corpus, "doc_id", "text", dir)
    val (bg, mg, v) = graft.operators.TextAnalysis.lmReadModel(spark, dir)

    val mem = MemoryStream[(Long, String)]
    val scored = graft.operators.TextAnalysis.lmScoreWithModel(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", bg, mg, v)
    // per-doc aggregation state: update mode (a doc's bigrams arrive in one
    // batch, so each group emits once, when its batch lands)
    val q = scored.writeStream.format("memory").queryName("lm_stream")
      .outputMode("update").start()
    try {
      mem.addData((9L, "a b c"), (10L, "z z z")) // 10: fully unseen bigrams
      q.processAllAvailable()
      mem.addData((11L, "b a"))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, n_bigrams, avg_nll_bits FROM lm_stream")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      // batch twin over the same rows, same frozen model, must agree exactly
      val twin = graft.operators.TextAnalysis.lmScoreWithModel(
          Seq((9L, "a b c"), (10L, "z z z"), (11L, "b a")).toDF("doc_id", "text"),
          "doc_id", "text", bg, mg, v)
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(got == twin, s"stream $got vs batch $twin")
      // the unseen doc hits the smoothed floor: P = 1/V per bigram, V = 3
      val floorBits = BigDecimal(-math.log(1.0 / 3) / math.log(2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got.find(_._1 == 10L).get._3 == floorBits, s"got $got")
    } finally q.stop()
  }

  test("streaming quota ingest: budgets re-rate against cumulative admits; replay overwrites") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-quota-ingest").toString
    val quotas = Map("web" -> 150L, "wiki" -> 1000L)
    val b1 = (1L to 1000L).map(QDoc(_, "web")) ++
      (100001L to 100050L).map(QDoc(_, "wiki"))
    val b2 = (2001L to 3000L).map(QDoc(_, "web")) ++
      (100051L to 100080L).map(QDoc(_, "wiki"))
    val mem = MemoryStream[QDoc]
    val q = StreamOps.streamingQuotaIngest(mem.toDF(), "src", "doc_id",
      quotas, dir)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    // the whole run is deterministic: recompute both batches' expected
    // member sets from the operator's own batch semantics
    val exp1 = graft.operators.Sampling.quotaSample(
        b1.toDF("doc_id", "src"), "src", "doc_id", quotas)
      .select("doc_id").as[Long].collect().toSet
    val admittedWeb = exp1.count(_ <= 1000L).toLong
    val exp2 = graft.operators.Sampling.quotaSample(
        b2.toDF("doc_id", "src"), "src", "doc_id",
        Map("web" -> math.max(0L, 150L - admittedWeb), "wiki" -> (1000L - 50L)))
      .select("doc_id").as[Long].collect().toSet
    def keptSet() = spark.read.parquet(s"$dir/kept")
      .select("doc_id").as[Long].collect().toSet
    val got = keptSet()
    assert(got == (exp1 ++ exp2), s"kept ${got.size} vs expected ${(exp1 ++ exp2).size}")
    // wiki is far under budget in both batches: every row admitted
    assert((100001L to 100080L).forall(got.contains), "under-budget stratum lost rows")
    // web re-rates DOWN in batch 2: cumulative admits stay near the budget
    val webKept = got.count(_ <= 10000L).toLong
    assert(webKept >= admittedWeb && webKept <= 150L + 60L,
      s"web cumulative admits $webKept vs budget 150 (batch1 $admittedWeb)")

    // failure replay: batch 1 runs again with the SAME id — stats for batch
    // 0 only are visible to it, so it recomputes the same member set and
    // overwrites its own partitions instead of appending
    StreamOps.quotaIngestBatch(b1.toDF("doc_id", "src"), "src", "doc_id",
      quotas, dir, 42L, batchId = 0L)
    assert(keptSet() == got, "replayed batch changed the kept store")
  }

  test("streaming pack ingest: batches continue each shard's token stream; equals one-shot packing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pack-ingest").toString
    // deterministic variable-length docs over two languages
    def doc(i: Long) = PDoc(i, if (i % 3 == 0) "de" else "en",
      (0L until (i % 17 + 3)).map(t => s"w${(i * 31 + t) % 97}").mkString(" "))
    val b1 = (1L to 200L).map(doc)
    val b2 = (201L to 400L).map(doc)
    val mem = MemoryStream[PDoc]
    val q = StreamOps.streamingPackIngest(mem.toDF(), "doc_id", "text",
      "lang", budget = 64L, nShards = 4, dir)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    // ids ascend across batches, so per-(stream, shard) arrival order ==
    // the one-shot window order: the incremental assignment must be
    // IDENTICAL to packing the concatenated corpus in one batch pass
    val got = spark.read.parquet(s"$dir/packed")
      .select("stream", "shard", "doc_id", "n_tokens", "tok_start",
        "seq_first", "seq_last")
      .as[(String, Int, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2, r._3)).toSeq
    val oneShot = graft.operators.TextAnalysis.packSequences(
        (b1 ++ b2).toDF("doc_id", "lang", "text"), "doc_id", "text", "lang",
        budget = 64L, nShards = 4)
      .select("stream", "shard", "doc_id", "n_tokens", "tok_start",
        "seq_first", "seq_last")
      .as[(String, Int, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2, r._3)).toSeq
    assert(got == oneShot, s"incremental pack diverged: ${got.size} vs ${oneShot.size} rows")

    // failure replay: batch 1 (id 0) reruns — earlier-batch offsets only,
    // same spans, overwrite not append
    StreamOps.packIngestBatch(b1.toDF("doc_id", "lang", "text"), "doc_id",
      "text", "lang", 64L, 4, dir, 42L, batchId = 0L)
    val again = spark.read.parquet(s"$dir/packed")
      .select("stream", "shard", "doc_id", "n_tokens", "tok_start",
        "seq_first", "seq_last")
      .as[(String, Int, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2, r._3)).toSeq
    assert(again == oneShot, "replayed batch changed the packed store")
  }

  test("streaming dedup keeps first occurrence within watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = StreamOps.streamingDedup(mem.toDF(), "ts", "10 minutes", Seq("user_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup").start()
    try {
      mem.addData(Ev(t(1), 1, "a", 1.0), Ev(t(2), 1, "b", 2.0), Ev(t(3), 2, "c", 3.0))
      q.processAllAvailable()
      val vals = spark.sql("SELECT user_id, event_type FROM dedup ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(vals == Seq((1L, "a"), (2L, "c")), s"got $vals")
    } finally q.stop()
  }

  test("streaming CUSUM equals the batch closed form on an ordered two-batch replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val evDf = graft.sources.Tables.events(spark, sf)
    // frozen baseline = the batch frame's own per-key means on the same
    // micro-unit grid the batch operator uses
    val mu = evDf
      .withColumn("__vu",
        (col("value").cast("decimal(18,6)") * 1000000).cast("long"))
      .groupBy("event_type")
      .agg(expr("sum(__vu) div count(1)").as("muu"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = evDf.select(col("ts"), col("user_id"), col("event_type"),
        col("value"), col("event_id"))
      .orderBy("ts", "event_id")
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))
    val split = ev.length / 2
    val mem = MemoryStream[(Timestamp, Long, String, Double, Long)]
    val run = StreamOps.streamingCusum(
      mem.toDF().toDF("ts", "user_id", "event_type", "value", "event_id"),
      "ts", "event_type", "value", "event_id", mu,
      slackU = 5000000L, thresholdU = 40000000L)
    val q = run.writeStream.outputMode("update")
      .format("memory").queryName("scusum").start()
    try {
      mem.addData(ev.take(split).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(ev.drop(split).toIndexedSeq)
      q.processAllAvailable()
      // the LAST update per key is the final fold state: alarms and peak
      // grow monotonically, so max() selects the final emission
      val streamed = spark.sql(
        """SELECT event_type, MAX(n_alarms) AS n_alarms,
          |  MAX(peak_cusum) AS peak_cusum, MIN(first_alarm_us) AS f
          |FROM scusum GROUP BY event_type""".stripMargin)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      val batch = graft.operators.Stats.cusum(evDf, "ts", "event_type",
          "value", "event_id", slack = 5.0, threshold = 40.0)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("vacuumVersions keeps the newest versions and the latest read still works") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-vacuum").toString
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "price")
    def chg(rows: Seq[(Long, Double, String, Long)]) =
      rows.toDF("k", "price", "op", "seq")
    StreamOps.maintenanceBatch(chg(Seq((3L, 30.0, "I", 1L))), base,
      Seq("k"), Seq("k"), 8, path, 1L << 20, "op", "seq", 0L,
      zmapCol = Some("k"))
    StreamOps.maintenanceBatch(chg(Seq((1L, 11.0, "U", 2L))), base,
      Seq("k"), Seq("k"), 8, path, 1L << 20, "op", "seq", 1L,
      zmapCol = Some("k"))
    StreamOps.maintenanceBatch(chg(Seq((2L, 20.0, "D", 3L))), base,
      Seq("k"), Seq("k"), 8, path, 1L << 20, "op", "seq", 2L,
      zmapCol = Some("k"))
    val dropped = StreamOps.vacuumVersions(spark, path, keepVersions = 1)
    assert(dropped == Seq(0L, 1L))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val left = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/snap"))
      .map(_.getPath.getName).filter(_.startsWith("batch_id=")).toSeq
    assert(left == Seq("batch_id=2"))
    // the maintained zonemap was vacuumed in lockstep
    val zleft = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/zonemap"))
      .map(_.getPath.getName).filter(_.startsWith("batch_id=")).toSeq
    assert(zleft == Seq("batch_id=2"))
    val latest = StreamOps.readLatestSnapshot(spark, path)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(latest.toSeq == Seq((1L, 11.0), (3L, 30.0)))
    // time travel below the horizon is gone — the documented contract
    intercept[Exception] {
      StreamOps.readLatestSnapshot(spark, path, asOf = Some(0L)).collect()
    }
  }

  test("streaming EWMA ingest: merged cell store reproduces the one-shot " +
      "EWMA exactly; replay overwrites") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ewma").toString
    // two batches that SPLIT hour buckets across batches (the merge law
    // has to do real work: same (key, hour) cell from both batches)
    val b1 = Seq(Ev(t(1), 1, "click", 2.0), Ev(t(2), 2, "click", 4.0),
      Ev(t(5), 3, "view", 10.0))
    val b2 = Seq(Ev(t(7), 4, "click", 6.0),
      Ev(Timestamp.valueOf("2024-01-01 11:15:00"), 5, "click", 8.0))
    val mem = MemoryStream[Ev]
    val q = StreamOps.streamingEwmaIngest(mem.toDF(), "ts", "event_type",
      "value", dir)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    def key(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val streamed = key(StreamOps.readHourlyEwma(spark, dir, "event_type"))
    val oneShot = key(graft.operators.Ml.ewmaHourly(
      (b1 ++ b2).toDF(), "ts", "event_type", "value"))
    assert(streamed == oneShot,
      s"streamed EWMA diverged:\n$streamed\nvs\n$oneShot")
    // click hour 10: mean(2,4,6) = 4 exactly, across the batch split
    assert(oneShot.exists(r => r._1 == "click" && r._4 == 4.0))

    // failure replay: re-land batch 0 — overwrite keeps cells exact
    StreamOps.idempotentBatchWrite(graft.operators.Ml.hourlyCells(
      b1.toDF(), "ts", "event_type", "value"), dir, 0L)
    assert(key(StreamOps.readHourlyEwma(spark, dir, "event_type"))
      == oneShot, "replayed batch broke the cell store")
  }

  test("streaming moments store: merged refit equals the one-shot OLS " +
      "bit-for-bit; replay overwrites") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mom").toString
    // (group, x, y) rows split so every group spans both batches
    val b1 = Seq(("A", 1.0, 2.1), ("A", 2.0, 3.9), ("B", 1.0, 9.0))
    val b2 = Seq(("A", 3.0, 6.2), ("B", 2.0, 7.0), ("B", 3.0, 5.1))
    val mem = MemoryStream[(String, Double, Double)]
    val q = StreamOps.streamingMomentsIngest(
      mem.toDF().toDF("g", "x", "y"), "g", "x", "y", dir)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val streamed = rows(StreamOps.readMomentsOls(spark, dir, "g"))
    val oneShot = rows(graft.operators.Stats.groupOls(
      (b1 ++ b2).toDF("g", "x", "y"), "g", "x", "y"))
    assert(streamed == oneShot,
      s"streamed OLS diverged:\n$streamed\nvs\n$oneShot")

    // replay batch 0: componentwise-additive cells must not double-count
    StreamOps.idempotentBatchWrite(graft.operators.Ml.momentCells(
      b1.toDF("g", "x", "y"), "g", "x", "y"), dir, 0L)
    assert(rows(StreamOps.readMomentsOls(spark, dir, "g")) == oneShot,
      "replayed batch broke the moments store")
  }
}
