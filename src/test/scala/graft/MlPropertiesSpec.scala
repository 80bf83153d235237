package graft

import graft.operators.Ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized laws for the rank-statistic / resampling operators, checked
  * against LOCAL first-principles brute force (deterministic seeds). This
  * is the independence the DuckDB gate cannot provide for these queries:
  * the oracle SQL mirrors the same moment identities, so a shared formula
  * bug would gate green — the brute recomputation here uses the DEFINITIONS
  * (pairwise concordance, rank sums, md5 bytes) instead. */
class MlPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def randPairs(seed: Int, n: Int): Seq[(Long, Double)] = {
    val rnd = new scala.util.Random(seed)
    // coarse value grid → plenty of ties, the hard case for rank math
    (0 until n).map(i => (i.toLong, (rnd.nextInt(8) + 1).toDouble))
  }

  private def avgRanks(vs: Seq[Double]): Seq[Double] = {
    val sorted = vs.sorted
    val first = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> (g.map(_._2).min + 1) }
    val cnt = vs.groupBy(identity).map { case (v, g) => v -> g.size }
    vs.map(v => first(v) + (cnt(v) - 1) / 2.0)
  }

  test("spearman equals Pearson-on-average-ranks, brute, with ties") {
    for (seed <- 1 to 5) {
      val n = 40 + seed * 7
      val xs = randPairs(seed, n).map(_._2)
      val ys = randPairs(seed + 100, n).map(_._2)
      val df = xs.zip(ys).zipWithIndex
        .map { case ((x, y), i) => ("g", x + i * 1e-9 * 0, x, y) }
        .map { case (g, _, x, y) => (g, x, y) }
        .toDF("g", "x", "y")
      val got = Ml.spearman(df, "g", "x", "y").head().getDouble(2)
      val rx = avgRanks(xs)
      val ry = avgRanks(ys)
      val mx = rx.sum / n; val my = ry.sum / n
      val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
      val vx = rx.map(a => (a - mx) * (a - mx)).sum
      val vy = ry.map(b => (b - my) * (b - my)).sum
      val want = cov / math.sqrt(vx * vy)
      assert(math.abs(got - want) < 1e-12, s"seed $seed: $got vs $want")
    }
  }

  test("mannWhitney U equals the brute pair count (ties = half)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val a = (0 until 30).map(_ => (rnd.nextInt(6) + 1).toDouble)
      val b = (0 until 25).map(_ => (rnd.nextInt(6) + 1).toDouble)
      val df = (a.map(("g", _, true)) ++ b.map(("g", _, false)))
        .toDF("g", "v", "isa")
      val got = Ml.mannWhitney(df, "g", "v", "isa").head().getDouble(3)
      val brute = (for (x <- a; y <- b) yield
        if (x > y) 1.0 else if (x == y) 0.5 else 0.0).sum
      assert(got == brute, s"seed $seed: U $got vs brute $brute")
    }
  }

  test("rocAuc equals the brute pairwise win probability") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val pos = (0 until 20).map(_ => (rnd.nextInt(9) + 1).toDouble)
      val neg = (0 until 30).map(_ => (rnd.nextInt(9) + 1).toDouble)
      val df = (pos.map(("g", _, true)) ++ neg.map(("g", _, false)))
        .toDF("g", "v", "pos")
      val got = Ml.rocAuc(df, "g", "v", col("pos")).head().getDouble(3)
      val brute = (for (p <- pos; q <- neg) yield
        if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum /
        (pos.size * neg.size)
      assert(math.abs(got - brute) < 1e-12, s"seed $seed: $got vs $brute")
    }
  }

  test("bootstrap replicate weights follow the md5 hex-digit law " +
      "byte-for-byte (JVM MD5 as the third engine)") {
    val keys = (0L until 64L)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hexW(key: Long, b: Int): Long = {
      val h = md.digest(key.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val d = h.charAt(b)
      val v = if (d >= 'a') d - 'a' + 10 else d - '0'
      if (v <= 5) 0L else if (v <= 11) 1L else if (v <= 13) 2L else 3L
    }
    val df = keys.map(k => ("g", k, 100.0)).toDF("g", "k", "t")
    // reach the weights through the public CI result is indirect; instead
    // recompute the cells from the same builder the operator uses
    val cents = (col("t").cast("decimal(18,2)") * 100).cast("long")
    val weights = df
      .withColumn("h", md5(col("k").cast("string")))
      .withColumn("b", explode(sequence(lit(0), lit(31))))
      .withColumn("a", ascii(col("h").substr(col("b") + 1, lit(1))))
      .withColumn("w", when(col("a") <= 53, 0L)
        .when(col("a") <= 57 || col("a") <= 98 && col("a") >= 97, 1L)
        .when(col("a") <= 100, 2L).otherwise(3L))
      .select("k", "b", "w").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    keys.foreach { k =>
      (0 until 32).foreach { b =>
        assert(weights((k, b)) == hexW(k, b),
          s"weight law diverged at key=$k b=$b")
      }
    }
    // and the law has the advertised exact moments over the digit space
    val law = Seq.fill(6)(0L) ++ Seq.fill(6)(1L) ++ Seq(2L, 2L, 3L, 3L)
    assert(law.sum == 16 && law.map(w => w * w).sum == 32) // mean 1, var 1
  }

  test("itemKnn cosine equals brute set cosine on random baskets") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val rows = for (bk <- 0 until 40; _ <- 0 until 3)
        yield (s"b$bk", rnd.nextInt(12).toLong)
      val df = rows.toDF("bk", "it")
      val sets = rows.distinct.groupBy(_._2)
        .map { case (it, g) => it -> g.map(_._1).toSet }
      val got = Ml.itemKnn(df, "bk", "it", probeMax = 100L, k = 100)
        .collect()
        .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(4)).toMap
      for (a <- sets.keys; b <- sets.keys if a < b) {
        val co = (sets(a) & sets(b)).size
        if (co > 0) {
          val want = co / math.sqrt(sets(a).size.toDouble * sets(b).size)
          assert(math.abs(got((a, b)) - want) < 1e-12,
            s"seed $seed pair ($a,$b)")
        } else assert(!got.contains((a, b)))
      }
    }
  }
}
