package graft

import graft.operators.Stats

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth toy-fixture tests for the round-9c operator batch
  * (q360+) — independent of the SQL-mirror oracle (which proves
  * Spark≡DuckDB, not that the algebra is the intended statistic). */
class Round9cOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  /** Textbook two-pass OLS RSS (centered means), independent of the
    * operator's one-pass integer-moment closed form. */
  private def olsRss(xs: Seq[Double], ys: Seq[Double]): Double = {
    val n = xs.size
    val mx = xs.sum / n
    val my = ys.sum / n
    val b = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      xs.map(x => (x - mx) * (x - mx)).sum
    val a = my - b * mx
    xs.zip(ys).map { case (x, y) =>
      val e = y - a - b * x; e * e }.sum
  }

  test("chowTest: kinked two-segment series vs textbook OLS RSS") {
    // pre-break days 0..2 (cents 100, 210, 290), post days 3..5
    // (400, 390, 420); break at day 3 -> n_pre = n_post = 3
    val ys = Seq(100L, 210L, 290L, 400L, 390L, 420L)
    val df = ys.zipWithIndex.map { case (c, i) =>
      ("g", i, c / 100.0) }.toDF("g", "i", "v")
      .select(col("g"), date_add(lit("1992-01-01"), col("i")).as("dt"),
        col("v"))
    val r = Stats.chowTest(df, "g", "dt", "v", "1992-01-04").head()
    val xs = Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0)
    val cents = ys.map(_.toDouble)
    val rss1 = olsRss(xs.take(3), cents.take(3))
    val rss2 = olsRss(xs.drop(3), cents.drop(3))
    val rssp = olsRss(xs, cents)
    val f = ((rssp - (rss1 + rss2)) / 2.0) / ((rss1 + rss2) / 2.0)
    assert(r.getAs[Long]("n_pre") == 3L && r.getAs[Long]("n_post") == 3L)
    assert(math.abs(r.getAs[Double]("rss_split") - (rss1 + rss2)) < 1e-6)
    assert(math.abs(r.getAs[Double]("rss_pooled") - rssp) < 1e-6)
    assert(math.abs(r.getAs[Double]("f_chow") - f) < 1e-6)
    assert(math.abs(rss1 - 150.0) < 1e-9) // hand check of the helper
  }

  test("chowTest: degenerate segment (perfect fits) yields NULL F") {
    // both segments exactly linear -> rss_split = 0 -> guarded NULL
    val df = Seq(0, 1, 2, 3, 4, 5).map { i =>
      ("g", i, if (i < 3) 1.0 * (i + 1) else 10.0 + i) }
      .toDF("g", "i", "v")
      .select(col("g"), date_add(lit("1992-01-01"), col("i")).as("dt"),
        col("v"))
    val r = Stats.chowTest(df, "g", "dt", "v", "1992-01-04").head()
    assert(r.isNullAt(r.fieldIndex("f_chow")))
  }

  test("kdeGrid: three-point sample vs direct Gaussian kernel sum") {
    // values 1.00 (x2) and 3.00 (x1); grid 0/2/4 dollars; h = 1
    val df = Seq(("t", 1.00), ("t", 1.00), ("t", 3.00)).toDF("g", "v")
    val rows = Stats.kdeGrid(df, "g", "v", 0L, 400L, 200L, 1.0)
      .collect()
    assert(rows.length == 3)
    def expected(x0: Double): Double =
      (2.0 * math.exp(-(x0 - 1.0) * (x0 - 1.0) / 2.0) +
        math.exp(-(x0 - 3.0) * (x0 - 3.0) / 2.0)) /
        (3.0 * 1.0 * math.sqrt(2.0 * math.Pi))
    rows.foreach { r =>
      val x = r.getAs[Double]("x")
      assert(r.getAs[Long]("n") == 3L)
      assert(math.abs(r.getAs[Double]("density") - expected(x)) < 1e-9,
        s"at x=$x")
    }
    // densities integrate-ish: the mode grid point (x=2 between the two
    // masses) is below the x=1-adjacent point
    val byX = rows.map(r => r.getAs[Double]("x") ->
      r.getAs[Double]("density")).toMap
    assert(byX(0.0) > byX(4.0)) // 2 points near 1.0 vs 1 point near 3.0
  }

  test("croston: hand fold over three demand occurrences") {
    // occurrences day 0 (10.00), day 4 (6.00), day 6 (8.00); a zero-
    // demand day 2 must be ignored entirely
    val df = Seq((0, 10.00), (2, 0.0), (4, 6.00), (6, 8.00))
      .toDF("i", "v")
      .select(lit(7L).as("k"),
        date_add(lit("1992-01-01"), col("i")).as("dt"), col("v"))
    val rows = Stats.croston(df, "k", "dt", "v").collect()
    assert(rows.length == 3)
    // seed: z=1000, p=1; day4: z=floor((600+1000)/2)=800, p=floor((4+1)/2)=2
    // day6: z=floor((800+800)/2)=800, p=floor((2+2)/2)=2
    val z = rows.map(_.getAs[Long]("z_c")).toSeq
    val p = rows.map(_.getAs[Long]("p_days")).toSeq
    assert(z == Seq(1000L, 800L, 800L))
    assert(p == Seq(1L, 2L, 2L))
    assert(math.abs(rows.last.getAs[Double]("forecast") - 4.0) < 1e-12)
  }
}
