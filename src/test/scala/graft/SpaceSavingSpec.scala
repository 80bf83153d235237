package graft

import graft.sketch.{SketchMergeException, SpaceSaving}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SpaceSaving kernel guarantees (exactness, eviction bounds, merge law,
  * wire format) plus the Catalyst wiring of approx_top_k / topk_sketch_agg /
  * topk_merge_agg. */
class SpaceSavingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Zipf-ish synthetic stream with known exact counts. */
  private def stream(seed: Int, n: Int, domain: Int): (Seq[String], Map[String, Long]) = {
    val rnd = new scala.util.Random(seed)
    val items = (0 until n).map { _ =>
      // skewed: item k with prob ~ 1/(k+1)
      val u = rnd.nextDouble()
      val k = math.min(domain - 1, (1.0 / u - 1.0).toInt)
      s"item$k"
    }
    (items, items.groupBy(identity).view.mapValues(_.size.toLong).toMap)
  }

  test("exact when capacity exceeds the distinct count") {
    val (items, exact) = stream(1, 50000, 40)
    val ss = new SpaceSaving(64)
    items.foreach(ss.offer)
    assert(!ss.serialize().isEmpty)
    val top = ss.topK(40)
    assert(top.size == exact.size)
    top.foreach { case (item, est, err) =>
      assert(err == 0L, s"$item err=$err")
      assert(est == exact(item), s"$item est=$est exact=${exact(item)}")
    }
  }

  test("eviction keeps the SpaceSaving bounds: true <= est <= true + err, err <= n/m") {
    val (items, exact) = stream(2, 100000, 5000)
    val m = 256
    val ss = new SpaceSaving(m)
    items.foreach(ss.offer)
    val n = items.size.toLong
    ss.topK(m).foreach { case (item, est, err) =>
      val t = exact.getOrElse(item, 0L)
      assert(t <= est, s"$item true=$t est=$est")
      assert(est - err <= t, s"$item est-err=${est - err} true=$t")
      assert(err <= n / m + 1, s"$item err=$err bound=${n / m}")
    }
    // every item with true count > n/m must be tracked
    val tracked = ss.topK(m).map(_._1).toSet
    exact.filter(_._2 > n / m).keys.foreach(k =>
      assert(tracked.contains(k), s"heavy item $k (count ${exact(k)}) missing"))
  }

  test("mixed-capacity merge trims to min(capacity) and keeps its bounds") {
    // two vintages of one store: capacity reconfigured 512 -> 128 mid-stream
    val (itemsA, _) = stream(31, 60000, 3000)
    val (itemsB, _) = stream(32, 60000, 3000)
    val exact = (itemsA ++ itemsB).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    for ((capA, capB) <- Seq((512, 128), (128, 512))) {
      val a = new SpaceSaving(capA)
      itemsA.foreach(a.offer)
      val b = new SpaceSaving(capB)
      itemsB.foreach(b.offer)
      a.mergeInPlace(b)
      val m = math.min(capA, capB)
      assert(a.capacity == m, s"merged capacity ${a.capacity}, want $m")
      val n = (itemsA.size + itemsB.size).toLong
      a.topK(m).foreach { case (item, est, err) =>
        val t = exact.getOrElse(item, 0L)
        assert(t <= est, s"$item true=$t est=$est")
        assert(est - err <= t, s"$item est-err=${est - err} true=$t")
        assert(err <= n / m + 1, s"$item err=$err bound=${n / m}")
      }
      // heavy items (count > n/m) survive the trim
      val tracked = a.topK(m).map(_._1).toSet
      exact.filter(_._2 > n / m).keys.foreach(k =>
        assert(tracked.contains(k), s"heavy item $k missing after trim to $m"))
    }
  }

  test("topk_merge_agg over a mixed-capacity store returns the trimmed answer") {
    GraftFunctions.register(spark)
    val (items, exact) = stream(33, 40000, 200)
    val df = items.zipWithIndex
      .map { case (it, i) => (if (i % 2 == 0) "old" else "new", it) }
      .toDF("vintage", "item")
    // old vintage stored at capacity 64, new at 256 — one store, two shapes
    val store = df.filter($"vintage" === "old")
      .agg(GraftFunctions.topk_sketch_agg($"item", 64).as("s"))
      .union(df.filter($"vintage" === "new")
        .agg(GraftFunctions.topk_sketch_agg($"item", 256).as("s")))
    val top = store.agg(GraftFunctions.topk_merge_agg($"s", 5, 256).as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.item", $"e.est", $"e.err").as[(String, Long, Long)].collect()
    assert(top.length == 5, s"expected a trimmed answer, got ${top.length} rows")
    // estimates still bracket the true counts
    top.foreach { case (item, est, err) =>
      val t = exact.getOrElse(item, 0L)
      assert(t <= est && est - err <= t, s"$item true=$t est=$est err=$err")
    }
    // the stream's heaviest item must lead
    assert(top.head._1 == exact.maxBy(_._2)._1)
  }

  test("merge of split streams keeps bounds; merge without evictions is exact") {
    val (items, exact) = stream(3, 60000, 3000)
    val m = 512
    val parts = items.grouped(items.size / 7 + 1).toSeq
    val summaries = parts.map { p => val s = new SpaceSaving(m); p.foreach(s.offer); s }
    val merged = summaries.reduce { (a, b) => a.mergeInPlace(b); a }
    val n = items.size.toLong
    merged.topK(m).foreach { case (item, est, err) =>
      val t = exact.getOrElse(item, 0L)
      assert(t <= est && est - err <= t, s"$item true=$t est=$est err=$err")
    }
    // exact regime: small domain, no evictions anywhere
    val (items2, exact2) = stream(4, 30000, 30)
    val sums2 = items2.grouped(5000).map { p =>
      val s = new SpaceSaving(64); p.foreach(s.offer); s
    }.toSeq
    val m2 = sums2.reduce { (a, b) => a.mergeInPlace(b); a }
    m2.topK(64).foreach { case (item, est, err) =>
      assert(err == 0L && est == exact2(item), s"$item est=$est err=$err")
    }
  }

  test("weighted eviction keeps the bounds over total weight") {
    val rnd = new scala.util.Random(43)
    val rows = Seq.fill(50000)((s"k${rnd.nextInt(2000)}", rnd.nextInt(20).toLong + 1))
    val exact = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val m = 128
    val ss = new SpaceSaving(m)
    rows.foreach { case (k, w) => ss.offer(org.apache.spark.unsafe.types.UTF8String.fromString(k), w) }
    val totalW = rows.map(_._2).sum
    assert(ss.n == totalW)
    ss.topK(m).foreach { case (item, est, err) =>
      val t = exact.getOrElse(item, 0L)
      assert(t <= est && est - err <= t, s"$item true=$t est=$est err=$err")
    }
    // any item whose true weight exceeds W/m must be tracked
    val tracked = ss.topK(m).map(_._1).toSet
    exact.filter(_._2 > totalW / m).keys.foreach(k =>
      assert(tracked.contains(k), s"heavy item $k (weight ${exact(k)}) missing"))
  }

  test("serialization round-trips; corrupted payloads fail cleanly") {
    val (items, _) = stream(5, 20000, 1000)
    val ss = new SpaceSaving(128)
    items.foreach(ss.offer)
    val bytes = ss.serialize()
    val back = SpaceSaving.deserialize(bytes)
    assert(back.topK(128) == ss.topK(128))
    assert(back.n == ss.n)
    // round-trip then continue offering
    back.offer("late-item")
    assert(back.n == ss.n + 1)
    val junk = bytes.clone(); junk(0) = 0x00
    val e1 = intercept[SketchMergeException](SpaceSaving.deserialize(junk))
    assert(e1.getMessage.contains("wire tag"))
    val trunc = bytes.take(6)
    intercept[Exception](SpaceSaving.deserialize(trunc))
    // mixed capacities are NOT an error: they trim to the smaller summary
    val a = new SpaceSaving(8); val b = new SpaceSaving(16)
    a.mergeInPlace(b)
    assert(a.capacity == 8)
  }

  test("approx_top_k via SQL and Column API: exact regime equals GROUP BY") {
    GraftFunctions.register(spark)
    val (items, exact) = stream(6, 20000, 25)
    val df = items.toDF("item")
    df.createOrReplaceTempView("ss_items")
    val viaSql = spark.sql(
      "SELECT explode(approx_top_k(item, 10, 100)) AS e FROM ss_items")
      .select($"e.item", $"e.est").as[(String, Long)].collect().toMap
    val expected = exact.toSeq.sortBy { case (i, c) => (-c, i) }.take(10).toMap
    assert(viaSql == expected)
    // empty group => NULL (matches approx_distinct convention)
    val nullRow = spark.sql(
      "SELECT approx_top_k(item) AS tk FROM ss_items WHERE item = 'nope'").collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("store-then-merge: topk_sketch_agg + topk_merge_agg equals one-shot") {
    GraftFunctions.register(spark)
    val (items, _) = stream(7, 30000, 20)
    val df = items.zipWithIndex.map { case (it, i) => (i % 13, it) }.toDF("g", "item")
    val oneShot = df.agg(GraftFunctions.approx_top_k($"item", 10, 64).as("tk"))
      .select(explode($"tk").as("e")).select($"e.item", $"e.est")
      .as[(String, Long)].collect().toSeq
    val stored = df.groupBy("g")
      .agg(GraftFunctions.topk_sketch_agg($"item", 64).as("s"))
      .agg(GraftFunctions.topk_merge_agg($"s", 10, 64).as("tk"))
      .select(explode($"tk").as("e")).select($"e.item", $"e.est")
      .as[(String, Long)].collect().toSeq
    assert(stored == oneShot)
  }

  test("weighted top-k: exact regime equals SUM-ranked GROUP BY") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(41)
    val rows = Seq.fill(20000)((s"item${rnd.nextInt(30)}", rnd.nextInt(100).toLong + 1))
    val df = rows.toDF("item", "w")
    df.createOrReplaceTempView("ss_weighted")
    val got = spark.sql(
      "SELECT explode(approx_top_k_weighted(item, w, 5, 100)) AS e FROM ss_weighted")
      .select($"e.item", $"e.est").as[(String, Long)].collect().toSeq
    val expected = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (i, c) => (-c, i) }.take(5)
    assert(got == expected)
    // non-integral weight fails fast
    val e = intercept[Exception](spark.sql(
      "SELECT approx_top_k_weighted(item, 0.5) FROM ss_weighted").collect())
    assert(e.getMessage.contains("integral"))
  }

  test("argument validation fails fast") {
    GraftFunctions.register(spark)
    Seq("item").toDF("item").createOrReplaceTempView("ss_one")
    val e1 = intercept[Exception](
      spark.sql("SELECT approx_top_k(item, 0) FROM ss_one").collect())
    assert(e1.getMessage.contains("k must be"))
    val e2 = intercept[Exception](
      spark.sql("SELECT approx_top_k(item, 10, 5) FROM ss_one").collect())
    assert(e2.getMessage.contains("capacity must be"))
    val e3 = intercept[Exception](
      spark.sql("SELECT approx_top_k(42) FROM ss_one").collect())
    assert(e3.getMessage.toLowerCase.contains("string"))
  }
}
