package graft

import graft.operators.{Audit, Cdc, Layout}
import graft.sources.Tables
import graft.streaming.StreamOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDC maintenance (merge/upsert, SCD2, streaming snapshot versions),
  * small-file compaction, and the data-quality audit operators. */
class CdcSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  import scala.jdk.CollectionConverters._

  private def snap(rows: Seq[(Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "name", "price")
  }

  private def chg(rows: Seq[(Long, String, Double, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "name", "price", "op", "seq")
  }

  test("mergeSnapshot: insert, update, delete, pass-through") {
    val base = snap(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    val changes = chg(Seq(
      (2L, "b2", 2.5, "U", 1L),   // update key 2
      (3L, "c", 3.0, "D", 1L),    // delete key 3
      (4L, "d", 4.0, "I", 1L)))   // insert key 4
    val out = Cdc.mergeSnapshot(base, changes, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, "a", 1.0), (2L, "b2", 2.5), (4L, "d", 4.0)))
  }

  test("mergeSnapshot: last-writer-wins within a batch, delete beats stale update") {
    val base = snap(Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    val changes = chg(Seq(
      (1L, "a1", 1.1, "U", 1L),
      (1L, "a2", 1.2, "U", 2L),   // wins over seq 1
      (2L, "bx", 9.9, "U", 1L),
      (2L, "b", 2.0, "D", 2L)))   // delete at seq 2 wins over the update
    val out = Cdc.mergeSnapshot(base, changes, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, "a2", 1.2)))
  }

  test("mergeSnapshot: empty changeset returns the base unchanged; delete of absent key is a no-op") {
    val base = snap(Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    val none = chg(Seq.empty)
    assert(Cdc.mergeSnapshot(base, none, Seq("k")).count() == 2L)
    val ghostDelete = chg(Seq((99L, "x", 0.0, "D", 1L)))
    assert(Cdc.mergeSnapshot(base, ghostDelete, Seq("k")).count() == 2L)
  }

  test("maintainGroupedAgg: delta path equals recompute incl. emptied, new, and moved groups") {
    import spark.implicits._
    // groups via name: g1 = {k1, k2}, g2 = {k3}. changes: delete k3
    // (empties g2), update k2 MOVING it to g3 with a new price, insert
    // k4 into g1, stale update of k1 beaten by a delete at higher seq
    val base = Seq((1L, "g1", 10.0), (2L, "g1", 20.0), (3L, "g2", 30.0))
      .toDF("k", "name", "price")
    val changes = Seq(
      (3L, "g2", 30.0, "D", 1L),
      (2L, "g3", 25.0, "U", 1L),
      (4L, "g1", 40.0, "I", 1L),
      (1L, "g1", 99.0, "U", 1L), (1L, "g1", 10.0, "D", 2L)
    ).toDF("k", "name", "price", "op", "seq")
    val priced = col("price").cast("decimal(18,2)")
    val baseAgg = base.groupBy("name")
      .agg(count(lit(1)).as("n"), sum(priced).as("total"))
    val got = Cdc.maintainGroupedAgg(baseAgg, base, changes, Seq("k"),
        Seq("name"), priced)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
    val recomputed = Cdc.mergeSnapshot(base, changes, Seq("k"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum(priced).as("total"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
    assert(got == recomputed, s"delta $got vs recompute $recomputed")
    assert(got == Map("g1" -> (1L, 40.0), "g3" -> (1L, 25.0)), s"got $got")
  }

  test("snapshotDiff: I/U/D classification, no-op rows silent, merge(old, diff) round-trips") {
    import spark.implicits._
    val old = snap(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    val neu = snap(Seq((1L, "a", 1.0),            // unchanged -> no row
      (2L, "b2", 2.0),                            // payload changed -> U
      (4L, "d", 4.0)))                            // new key -> I ; 3 gone -> D
    val d = Cdc.snapshotDiff(old, neu, Seq("k"))
    val got = d.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .toSet
    assert(got == Set((2L, "b2", 2.0, "U"), (4L, "d", 4.0, "I"),
      (3L, "c", 3.0, "D")), s"got $got")

    // round trip: applying the derived diff reproduces the new snapshot
    val applied = Cdc.mergeSnapshot(old, d.withColumn("seq", lit(1L)), Seq("k"))
    assert(applied.exceptAll(neu).isEmpty && neu.exceptAll(applied).isEmpty,
      "merge(old, diff(old, new)) must equal new")

    // NULL-safe payload compare: NULL == NULL is not a change
    val withNullOld = snap(Seq((1L, "a", 1.0))).withColumn("name", lit(null).cast("string"))
    val withNullNew = snap(Seq((1L, "x", 1.0))).withColumn("name", lit(null).cast("string"))
    assert(Cdc.snapshotDiff(withNullOld, withNullNew, Seq("k")).isEmpty)
  }

  test("scd2: consecutive-equal compression, version chain, open current interval") {
    import spark.implicits._
    val log = Seq(
      // key 1: A,A,B,A -> 3 versions (A, B, A)
      (1L, "A", 10L, 100L), (1L, "A", 20L, 101L),
      (1L, "B", 30L, 102L), (1L, "A", 40L, 103L),
      // key 2: single row -> one open version
      (2L, "Z", 15L, 200L)
    ).toDF("k", "attr", "ts", "tie")
    val hist = Cdc.scd2(log, Seq("k"), "attr", "ts", "tie")
      .orderBy("k", "version")
      .select("k", "attr", "valid_from", "valid_to", "version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4)))
    assert(hist.toSeq == Seq(
      (1L, "A", 10L, 30L, 1L),
      (1L, "B", 30L, 40L, 2L),
      (1L, "A", 40L, -1L, 3L),
      (2L, "Z", 15L, -1L, 1L)))
  }

  test("scd2 plan: one exchange — both windows and the aggregate ride the key partitioning") {
    import spark.implicits._
    val log = Seq((1L, "A", 10L, 1L)).toDF("k", "attr", "ts", "tie")
    val plan = Cdc.scd2(log, Seq("k"), "attr", "ts", "tie")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one shuffle, plan:\n$plan")
  }

  test("streaming merge ingest: snapshot versions match sequential batch merges; replay overwrites") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-ingest").toString
    val base = snap(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    val b0 = Seq((2L, "b2", 2.5, "U", 1L), (4L, "d", 4.0, "I", 1L))
    val b1 = Seq((1L, "a", 1.0, "D", 1L), (4L, "d2", 4.4, "U", 1L))

    val mem = MemoryStream[(Long, String, Double, String, Long)]
    val q = StreamOps.streamingMergeIngest(
      mem.toDF().toDF("k", "name", "price", "op", "seq"), base, Seq("k"), dir)
    try {
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()

    def version(v: Long): Set[(Long, String, Double)] =
      spark.read.parquet(s"$dir/snap").filter(col("batch_id") === v)
        .select("k", "name", "price")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

    val exp0 = Cdc.mergeSnapshot(base, chg(b0), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val exp1 = Cdc.mergeSnapshot(Cdc.mergeSnapshot(base, chg(b0), Seq("k")),
        chg(b1), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(version(0L) == exp0, "version 0 diverged from batch merge")
    assert(version(1L) == exp1, "version 1 diverged from sequential merges")
    assert(exp1 == Set((2L, "b2", 2.5), (3L, "c", 3.0), (4L, "d2", 4.4)))

    // replay batch 1: reads version 0 (strictly earlier), recomputes the
    // same merge, overwrites its own partition — no duplicate rows
    StreamOps.mergeIngestBatch(chg(b1), base, Seq("k"), dir, "op", "seq", 1L)
    assert(version(1L) == exp1, "replayed batch changed the snapshot")
    val total = spark.read.parquet(s"$dir/snap")
      .filter(col("batch_id") === 1L).count()
    assert(total == exp1.size.toLong, "replay appended instead of overwriting")
  }

  test("streaming maintenance: merged + z-ordered snapshot chain, layout pinned, replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-maint-stream").toString
    // keys double as z-coordinates: (k % 16, k) under 6-bit lanes
    val base = snap((0L until 48L).map(k => (k, s"n$k", k * 1.0)))
    val b0 = Seq((3L, "u3", 3.3, "U", 1L), (50L, "i50", 50.0, "I", 1L))
    val b1 = Seq((3L, "u3b", 3.6, "U", 2L), (7L, "n7", 7.0, "D", 2L))
    val zc = Seq("k2", "k")
    def withK2(df: DataFrame): DataFrame = df.withColumn("k2", col("k") % 16)

    val mem = MemoryStream[(Long, String, Double, String, Long)]
    val q = StreamOps.streamingMaintenance(
      withK2(mem.toDF().toDF("k", "name", "price", "op", "seq")),
      withK2(base), Seq("k"), zc, 6, dir, targetBytes = 1L << 10,
      zmapCol = Some("k"))
    try {
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()

    def version(v: Long): Set[(Long, String, Double)] =
      spark.read.parquet(s"$dir/snap").filter(col("batch_id") === v)
        .select("k", "name", "price")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

    val m0 = Cdc.mergeSnapshot(base, chg(b0), Seq("k"))
    val exp0 = m0.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val exp1 = Cdc.mergeSnapshot(m0, chg(b1), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(version(0L) == exp0, "version 0 diverged from batch merge")
    assert(version(1L) == exp1, "version 1 diverged from sequential merges")
    assert(exp1.contains((3L, "u3b", 3.6)) && !exp1.exists(_._1 == 7L),
      "batch 1 must build on version 0")

    // layout: each version's files carry DISJOINT z-ranges (range
    // partitioning) and are locally sorted — the written snapshot is born
    // clustered, no separate OPTIMIZE pass
    val zv = Layout.zValue(Seq(col("k") % 16, col("k")), 6)
    import org.apache.spark.sql.Row
    val ranges = spark.read.parquet(s"$dir/snap")
      .filter(col("batch_id") === 1L)
      .select(input_file_name().as("f"), zv.as("z"))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map { case Row(_, lo: Long, hi: Long) => (lo, hi) }
      .sortBy(_._1)
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping z-ranges across files: $ranges")
      case _ =>
    }

    // the maintained zone map: one manifest version per batch, and the
    // pruned read of a k-range opens a strict file subset with exact content
    val zmVersions = spark.read.parquet(s"$dir/zonemap")
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(zmVersions == Set(0L, 1L), s"zonemap versions: $zmVersions")
    val prunedLo = StreamOps.zoneMapPrunedSnapshot(spark, dir, 1L, "k",
      lit(0L), lit(8L))
    val allFiles = spark.read.parquet(s"$dir/snap")
      .filter(col("batch_id") === 1L).inputFiles.length
    assert(prunedLo.inputFiles.length < allFiles,
      s"zone map pruned nothing: ${prunedLo.inputFiles.length} of $allFiles")
    assert(prunedLo.select("k").collect().map(_.getLong(0)).toSet ==
      exp1.map(_._1).filter(k => k >= 0L && k < 8L),
      "pruned snapshot scan diverged from the version content")

    // replay batch 1: reads version 0, recomputes, overwrites its own dir
    StreamOps.maintenanceBatch(withK2(chg(b1)), withK2(base), Seq("k"), zc, 6,
      dir, 1L << 10, "op", "seq", 1L, zmapCol = Some("k"))
    // the manifest describes exactly the version's ROW-BEARING files (an
    // empty part-file has nothing a skip could miss)
    assert(spark.read.parquet(s"$dir/zonemap")
      .filter(col("batch_id") === 1L).count() ==
      spark.read.parquet(s"$dir/snap").filter(col("batch_id") === 1L)
        .select(input_file_name()).distinct().count(),
      "replayed zonemap must describe exactly the replayed version's files")
    assert(version(1L) == exp1, "replayed batch changed the snapshot")
    assert(spark.read.parquet(s"$dir/snap").filter(col("batch_id") === 1L)
      .count() == exp1.size.toLong, "replay appended instead of overwriting")

    // the consumer entry point: latest version + time travel
    def asSet(df: DataFrame): Set[(Long, String, Double)] =
      df.select("k", "name", "price")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(asSet(StreamOps.readLatestSnapshot(spark, dir)) == exp1)
    assert(asSet(StreamOps.readLatestSnapshot(spark, dir, asOf = Some(0L))) == exp0)
    intercept[IllegalStateException] {
      StreamOps.readLatestSnapshot(spark,
        java.nio.file.Files.createTempDirectory("graft-empty").toString)
    }
  }

  test("compact: file count collapses to the computed target; content survives byte-for-byte") {
    val ev = Tables.events(spark, sf)
    val shard = java.nio.file.Files.createTempDirectory("graft-shard-t").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact-t").toString
    ev.repartition(32).write.mode("overwrite").parquet(shard)
    def parquetFiles(dir: String): Int =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(shard) == 32)

    val small = spark.read.parquet(shard)
    val n = Layout.compact(small, out, targetBytes = 256L << 20)
    assert(parquetFiles(out) == n, "written file count != computed target")
    assert(n < 32, s"compaction did not reduce file count (n=$n)")

    val a = ev.orderBy("event_id").collect().map(_.toString)
    val b = spark.read.parquet(out).orderBy("event_id").collect().map(_.toString)
    assert(a.sameElements(b), "compaction changed the data")
  }

  test("compact: file count scales with plan-stats size / targetBytes") {
    val ev = Tables.events(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft-compact-n").toString
    val bytes = ev.queryExecution.optimizedPlan.stats.sizeInBytes
    val target = (bytes / 4).max(1).toLong
    val n = Layout.compact(ev, out, targetBytes = target)
    assert(n >= 4 && n <= 5, s"expected ~4 files for a 1/4-size target, got $n")
  }

  test("rowChecks: null check results count as violations") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 5.0), (2L, 50.0), (3L, null), (null, 7.0))
      .toDF("id", "v")
    val m = Audit.rowChecks(df, Seq(
      Audit.RowCheck("id_not_null", col("id").isNotNull),
      Audit.RowCheck("v_in_range", col("v") >= 0 && col("v") <= 10)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m("id_not_null") == ((1L, 4L)))
    // 50.0 out of range AND the null v row both violate (null is not a pass)
    assert(m("v_in_range") == ((2L, 4L)))
  }

  test("uniqueness and referential checks count duplicate groups and orphans") {
    import spark.implicits._
    val child = Seq((1L, 1), (1L, 1), (1L, 2), (2L, 1), (9L, 1))
      .toDF("k", "ln")
    val parent = Seq(1L, 2L).toDF("k")
    val uniq = Audit.uniquenessCheck(child, Seq("k", "ln"), "u")
      .collect().head
    assert((uniq.getString(0), uniq.getLong(1), uniq.getLong(2)) == (("u", 1L, 4L)))
    val fk = Audit.referentialCheck(child, "k", parent, "k", "fk")
      .collect().head
    assert((fk.getString(0), fk.getLong(1), fk.getLong(2)) == (("fk", 1L, 5L)))
  }

  test("seasonalAnomalies: spike flagged against ITS OWN hour's baseline, constant seasons silent") {
    import spark.implicits._
    // season grid: 10s buckets, 2 seasons. season 0 baseline = 2 events
    // per bucket across 10 days + ONE bucket with 30 (the spike; z ≈ 3.16
    // — note 9 baseline cells would put the spike at z = 3.0 EXACTLY,
    // which the strict > correctly leaves unflagged); season 1 constant 5
    // -> zero variance -> silent even though 5 != 2
    val rows = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (d <- 0 until 10; _ <- 0 until 2) rows += d * 20L         // season 0, n=2
    for (_ <- 0 until 30) rows += 10 * 20L                        // season 0 spike
    for (d <- 0 until 11; _ <- 0 until 5) rows += d * 20L + 10L   // season 1, n=5
    val ev = rows.toSeq.toDF("s")
      .select(timestamp_micros(col("s") * 1000000L).as("ts"), lit("e").as("k"))
    val got = Audit.seasonalAnomalies(ev, "ts", "k", bucketSeconds = 10L,
        seasonBuckets = 2, k = 3.0)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((200L, 0L, 30L)), s"got ${got.toSeq}")
  }

  test("madAnomalies: planted outlier flagged, inliers pass, constant key yields none") {
    import spark.implicits._
    val rows =
      (1 to 20).map(i => (1L, i.toLong, 10.0 + (i % 5))) ++ // inliers 10..14
      Seq((1L, 99L, 500.0)) ++                              // planted outlier
      (1 to 10).map(i => (2L, 1000L + i, 7.0))              // constant key
    val df = rows.toDF("user", "eid", "v")
    val out = Audit.madAnomalies(df, "user", "v", k = 3.0)
      .select("eid").collect().map(_.getLong(0)).toSet
    assert(out == Set(99L), s"expected only the planted outlier, got $out")
    // the KLL variant, uncompacted regime (n << k): identical flag set
    val approx = Audit.madAnomaliesApprox(df, "user", "v", k = 3.0)
      .select("eid").collect().map(_.getLong(0)).toSet
    assert(approx == Set(99L), s"approx MAD diverged, got $approx")
  }

  test("q114 window battery plan: all seven window functions ride one shuffle") {
    val df = graft.operators.Relational.q114WindowBattery(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one shuffle for the window battery:\n$plan")
  }

  test("maintained bloom index: per-version manifests, pruned point lookup, replay idempotent") {
    import graft.streaming.StreamOps
    val dir = java.nio.file.Files.createTempDirectory("graft-maint-bloom").toString
    val base = snap((0L until 48L).map(k => (k, s"n$k", k * 1.0)))
    val b0 = chg(Seq((3L, "u3", 3.3, "U", 1L), (50L, "i50", 50.0, "I", 1L)))
    val b1 = chg(Seq((3L, "u3b", 3.6, "U", 2L), (7L, "n7", 7.0, "D", 2L)))
    def withK2(df: DataFrame): DataFrame = df.withColumn("k2", col("k") % 16)
    val zc = Seq("k2", "k")
    val bloom = Some(("k", 1 << 12, 5))
    StreamOps.maintenanceBatch(withK2(b0), withK2(base), Seq("k"), zc, 6,
      dir, 1L << 10, "op", "seq", 0L, bloomSpec = bloom)
    StreamOps.maintenanceBatch(withK2(b1), withK2(base), Seq("k"), zc, 6,
      dir, 1L << 10, "op", "seq", 1L, bloomSpec = bloom)
    val versions = spark.read.parquet(s"$dir/bloomidx")
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(versions == Set(0L, 1L), s"bloomidx versions: $versions")
    // point lookup through the index: updated key present with batch-1
    // value, deleted key absent, file subset strictly pruned
    val probe = StreamOps.bloomPrunedSnapshot(spark, dir, 1L, "k",
      Seq(3L, 7L, 50L))
    val allFiles = spark.read.parquet(s"$dir/snap")
      .filter(col("batch_id") === 1L).inputFiles.length
    assert(probe.inputFiles.length < allFiles,
      s"bloom pruned nothing: ${probe.inputFiles.length} of $allFiles")
    val got = probe.select("k", "name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(3L -> "u3b", 50L -> "i50"), s"lookup content: $got")
    // replay batch 1: manifest version overwritten, describes exactly the
    // replayed version's row-bearing files
    StreamOps.maintenanceBatch(withK2(b1), withK2(base), Seq("k"), zc, 6,
      dir, 1L << 10, "op", "seq", 1L, bloomSpec = bloom)
    assert(spark.read.parquet(s"$dir/bloomidx")
      .filter(col("batch_id") === 1L).count() ==
      spark.read.parquet(s"$dir/snap").filter(col("batch_id") === 1L)
        .select(input_file_name()).distinct().count())
    val again = StreamOps.bloomPrunedSnapshot(spark, dir, 1L, "k",
      Seq(3L, 7L, 50L)).select("k", "name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == got, "replayed bloom index changed the lookup")
  }

  test("winsorizedStats: hand-checked percentiles, clip counts, winsorized mean") {
    import graft.operators.Audit
    val spark2 = spark; import spark2.implicits._
    val df = (1 to 10).map(v => ("a", v.toDouble)).toDF("g", "v")
    val r = Audit.winsorizedStats(df, Seq("g"), "v", 0.05, 0.95).collect()(0)
    // interpolated p05 over 1..10 = 1.45, p95 = 9.55
    assert(r.getLong(1) == 10)
    assert(math.abs(r.getDouble(2) - 1.45) < 1e-12)
    assert(math.abs(r.getDouble(3) - 9.55) < 1e-12)
    assert(r.getLong(4) == 1 && r.getLong(5) == 1) // 1 clipped, 10 clipped
    // mean of (1.45, 2..9, 9.55) = (1.45 + 44 + 9.55) / 10
    assert(math.abs(r.getDouble(6) - 5.5) < 1e-12)
  }
}
