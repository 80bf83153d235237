package graft

import graft.sketch.{BloomFilter, SketchMergeException}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom filter kernel guarantees (no false negatives, FPR near theory,
  * OR-merge) plus the bloom_agg / might_contain Catalyst wiring and the
  * bloom-prefiltered semi-join operator. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("no false negatives, FPR near theory at 10 bits/element") {
    val rnd = new scala.util.Random(11)
    val n = 10000
    val inserted = (0 until n).map(_ => rnd.nextLong()).distinct
    val bf = new BloomFilter(n * 10 - (n * 10 % 64) + 64, 7)
    inserted.foreach(bf.offerHash)
    inserted.foreach(h => assert(bf.mightContainHash(h), "false negative!"))
    val probes = (0 until 100000).map(_ => rnd.nextLong()).filterNot(inserted.contains)
    val fp = probes.count(bf.mightContainHash).toDouble / probes.size
    // theoretical ~0.0082 at exactly 10 bits/element, k=7; allow 3x slack
    assert(fp < 0.03, s"false positive rate $fp")
  }

  test("merge is bitwise OR; shape mismatch fails cleanly") {
    val a = new BloomFilter(6400, 7)
    val b = new BloomFilter(6400, 7)
    (1L to 100L).foreach(a.offerHash)
    (101L to 200L).foreach(b.offerHash)
    a.mergeInPlace(b)
    (1L to 200L).foreach(h => assert(a.mightContainHash(h)))
    val e = intercept[SketchMergeException] {
      a.mergeInPlace(new BloomFilter(128, 7))
    }
    assert(e.getMessage.contains("shape"))
    val bytes = a.serialize()
    val back = BloomFilter.deserialize(bytes)
    (1L to 200L).foreach(h => assert(back.mightContainHash(h)))
    val junk = bytes.clone(); junk(0) = 0x01
    intercept[SketchMergeException](BloomFilter.deserialize(junk))
  }

  test("bloom_agg + might_contain via SQL: no inserted key ever misses") {
    GraftFunctions.register(spark)
    (1L to 5000L).toDF("k").createOrReplaceTempView("bloom_keys")
    (4000L to 9000L).toDF("k").createOrReplaceTempView("bloom_probes")
    val missed = spark.sql(
      """SELECT count(*) FROM bloom_probes
        |WHERE k <= 5000
        |  AND NOT might_contain((SELECT bloom_agg(k, 65536, 7) FROM bloom_keys), k)
        |""".stripMargin).as[Long].head()
    assert(missed == 0L, s"$missed false negatives")
    // probes far outside the inserted range are mostly rejected
    val passed = spark.sql(
      """SELECT count(*) FROM bloom_probes
        |WHERE k > 5000
        |  AND might_contain((SELECT bloom_agg(k, 65536, 7) FROM bloom_keys), k)
        |""".stripMargin).as[Long].head()
    assert(passed < 400, s"$passed of 4000 non-members passed (FPR too high)")
  }

  test("bloom_merge_agg: stored partial filters OR to the full filter") {
    GraftFunctions.register(spark)
    val df = (1L to 2000L).map(k => (k % 7, k)).toDF("g", "k")
    val stored = df.groupBy("g")
      .agg(GraftFunctions.bloom_agg($"k", 65536, 7).as("bf"))
      .agg(GraftFunctions.bloom_merge_agg($"bf", 65536, 7).as("bf"))
      .select($"bf").as[Array[Byte]].head()
    val merged = BloomFilter.deserialize(stored)
    val oneShot = BloomFilter.deserialize(
      df.agg(GraftFunctions.bloom_agg($"k", 65536, 7).as("bf"))
        .select($"bf").as[Array[Byte]].head())
    assert(java.util.Arrays.equals(stored,
      oneShot.serialize()), "merged filter != one-shot filter")
    assert(merged.mightContainHash _ != null)
  }

  test("bloomSemiJoin equals the plain semi-join") {
    val fact = (1L to 10000L).map(k => (k, k % 997)).toDF("row_id", "fk")
    val dim = (0L to 996L by 13).toDF("pk")
    val got = graft.operators.RuntimeFilter
      .bloomSemiJoin(fact, dim, "fk", "pk", numBits = 65536)
      .select("row_id").as[Long].collect().sorted.toSeq
    val expected = fact.join(dim, $"fk" === $"pk", "left_semi")
      .select("row_id").as[Long].collect().sorted.toSeq
    assert(got == expected)
  }

  test("bloomSemiJoin is lazy: construction and planning run no job; no filter literal in the plan") {
    val fact = (1L to 1000L).map(k => (k, k % 97)).toDF("row_id", "fk")
    val dim = (0L to 96L by 3).toDF("pk")
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = graft.operators.RuntimeFilter.bloomSemiJoin(fact, dim, "fk", "pk")
      // force full analysis + physical planning WITHOUT an action
      val planned = df.queryExecution.executedPlan.toString
      Thread.sleep(500) // listener bus delivery is async
      assert(jobs == 0,
        s"constructing/planning the bloom semi-join ran $jobs Spark job(s)")
      // the filter rides a subquery, not an inlined BINARY literal
      assert(planned.toLowerCase.contains("subquery"), planned)
      val got = df.select("row_id").as[Long].collect().sorted.toSeq
      val expected = fact.join(dim, $"fk" === $"pk", "left_semi")
        .select("row_id").as[Long].collect().sorted.toSeq
      assert(got == expected)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("auto-sized geometry matches Bloom theory and caps at MaxAutoBits") {
    val (m, k) = graft.operators.RuntimeFilter.bloomGeometry(1000000L, 0.01)
    // m = -n ln(0.01)/ln^2 2 = 9585058.7 -> next 64-bit word
    assert(m % 64 == 0 && m >= 9585059 - 64 && m <= 9585059 + 128, s"m=$m")
    assert(k == 7, s"k=$k")
    val (mCap, kCap) = graft.operators.RuntimeFilter.bloomGeometry(1L << 40, 0.01)
    assert(mCap == graft.operators.RuntimeFilter.MaxAutoBits)
    assert(kCap == 1, s"capped filter should drop to the minimum probes, got $kCap")
    val (mTiny, _) = graft.operators.RuntimeFilter.bloomGeometry(1L, 0.01)
    assert(mTiny >= 64 && mTiny % 64 == 0)
  }
}
