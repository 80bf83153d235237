package graft

import graft.operators.{Behavior, Ml, Sampling, Similarity, Stats, TextAnalysis}

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

  /** Textbook OLS slope + its t statistic (centered two-pass sums),
    * independent of the operator's integer-moment closed form. */
  private def olsSlopeT(xs: Seq[Double], ys: Seq[Double]): (Double, Double) = {
    val n = xs.size
    val mx = xs.sum / n
    val my = ys.sum / n
    val sxx = xs.map(x => (x - mx) * (x - mx)).sum
    val b = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / sxx
    val a = my - b * mx
    val rss = xs.zip(ys).map { case (x, y) =>
      val e = y - a - b * x; e * e }.sum
    (b, b / math.sqrt(rss / (n - 2) / sxx))
  }

  test("engleGranger: regression + residual DF stage vs textbook OLS") {
    // ya ramps 100..170; yb = 2*ya + alternating +-7 cents noise
    val ya = (0 until 8).map(i => 100L + 10L * i)
    val noise = Seq(7L, -5L, 6L, -8L, 5L, -6L, 8L, -7L)
    val yb = ya.zip(noise).map { case (a, e) => 2L * a + e }
    val rows = (0 until 8).flatMap { i =>
      Seq(("a", i, ya(i) / 100.0), ("b", i, yb(i) / 100.0)) }
    val df = rows.toDF("g", "i", "v")
      .select(col("g"), date_add(lit("1992-01-01"), col("i")).as("dt"),
        col("v"))
    val r = Stats.engleGranger(df, "g", "dt", "v").head()
    assert(r.getAs[String]("g_x") == "a" && r.getAs[String]("g_y") == "b")
    assert(r.getAs[Long]("n_days") == 8L)
    // stage 1: textbook OLS of yb on ya
    val xs = ya.map(_.toDouble)
    val (beta, _) = olsSlopeT(xs, yb.map(_.toDouble))
    val alpha = yb.map(_.toDouble).sum / 8 - beta * xs.sum / 8
    assert(math.abs(r.getAs[Double]("beta") - beta) < 1e-9)
    assert(math.abs(r.getAs[Double]("alpha") - alpha) < 1e-9)
    // stage 2: DF regression of d(e) on lag(e) over the FLOORED residuals
    val e = (0 until 8).map(i =>
      math.floor(yb(i) - alpha - beta * ya(i)))
    val elag = e.dropRight(1)
    val de = e.drop(1).zip(elag).map { case (c, p) => c - p }
    val (gamma, t) = olsSlopeT(elag, de)
    assert(math.abs(r.getAs[Double]("gamma") - gamma) < 1e-9)
    assert(math.abs(r.getAs[Double]("t_eg") - t) < 1e-9)
    assert(gamma < -1.0) // alternating spread mean-reverts hard
  }

  test("msprt: one-day 2x2 fixture, hand likelihood ratio") {
    // pick user ids by the engine's own arm rule (first md5 hex <= '7')
    def armOf(u: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (hex.charAt(0) <= '7') 1 else 0
    }
    val ids = (1L to 100L).toList
    val ctrl = ids.filter(armOf(_) == 0).take(2)
    val treat = ids.filter(armOf(_) == 1).take(2)
    // control values 1.00, 3.00; treated 2.00, 6.00 (cents: mean diff 200)
    val rows = Seq((ctrl(0), 1.00), (ctrl(1), 3.00),
      (treat(0), 2.00), (treat(1), 6.00))
    val df = rows.toDF("user_id", "v")
      .select(lit("t").as("g"),
        to_timestamp(lit("1995-01-01 12:00:00")).as("ts"),
        col("user_id"), col("v"))
    val r = Ml.msprt(df, "g", "ts", "user_id", "v", tau2 = 10000.0).head()
    assert(r.getAs[Long]("n0") == 2L && r.getAs[Long]("n1") == 2L)
    assert(math.abs(r.getAs[Double]("theta_c") - 200.0) < 1e-12)
    // sse = (10^2+... exact): v = s2*(1/2+1/2) = 50000
    assert(math.abs(r.getAs[Double]("v_c2") - 50000.0) < 1e-9)
    val lr = math.sqrt(50000.0 / 60000.0) *
      math.exp(200.0 * 200.0 * 10000.0 / (2.0 * 50000.0 * 60000.0))
    assert(math.abs(r.getAs[Double]("lr") - lr) < 1e-12)
    assert(r.getAs[Double]("p_always_valid") ==
      math.min(1.0, 1.0 / lr))
  }

  test("gumbelReturnLevels: monthly maxima extraction + MoM fit") {
    // months 1..4 with two days each; maxima 1.00 2.00 3.00 4.00
    // 1992 is a leap year: Jan = days 0..30, Feb = 31..59, Mar = 60..90,
    // Apr starts at day 91
    val rows = Seq((0, 0.50), (1, 1.00), (31, 2.00), (32, 1.50),
      (60, 3.00), (61, 0.25), (91, 4.00), (92, 2.00))
    val df = rows.toDF("i", "v")
      .select(lit("g").as("g"),
        date_add(lit("1992-01-01"), col("i")).as("dt"), col("v"))
    val r = Stats.gumbelReturnLevels(df, "g", "dt", "v").head()
    assert(r.getAs[Long]("n_blocks") == 4L)
    val maxima = Seq(100.0, 200.0, 300.0, 400.0)
    val mean = maxima.sum / 4
    val varr = maxima.map(m => (m - mean) * (m - mean)).sum / 3
    val beta = math.sqrt(varr) * math.sqrt(6.0) / math.Pi
    val mu = mean - 0.5772156649015329 * beta
    assert(math.abs(r.getAs[Double]("mean_max") - mean / 100) < 1e-9)
    assert(math.abs(r.getAs[Double]("gumbel_beta") - beta / 100) < 1e-9)
    assert(math.abs(r.getAs[Double]("gumbel_mu") - mu / 100) < 1e-9)
    val rl12 = mu - beta * math.log(-math.log(1.0 - 1.0 / 12.0))
    assert(math.abs(r.getAs[Double]("rl_12") - rl12 / 100) < 1e-9)
    assert(r.getAs[Double]("rl_60") > r.getAs[Double]("rl_12"))
  }

  test("gridDensityClusters2d: two clusters, noise cell, isolated core") {
    // unit cells; 8 points, frac 0.3 -> neighborhood threshold ceil(2.4)=3
    // cluster A: cells (0,0) n=2 and (1,0) n=2; isolated core (10,0) n=3;
    // noise cell (5,5) n=1 never reaches 3
    val pts = Seq.fill(2)((0.5, 0.5)) ++ Seq.fill(2)((1.5, 0.5)) ++
      Seq.fill(3)((10.5, 0.5)) ++ Seq((5.5, 5.5))
    val df = pts.toDF("x", "y")
    val rows = Stats.gridDensityClusters2d(df, col("x"), col("y"),
      xCell = 1.0, yCell = 1.0, minPtsFrac = 0.3).collect()
    assert(rows.length == 2)
    val a = rows(0); val b = rows(1)
    assert(a.getAs[Long]("cluster_id") == 100001000L) // (cx=0, cy=0)
    assert(a.getAs[Long]("n_cells") == 2L && a.getAs[Long]("n_points") == 4L)
    assert(a.getAs[Long]("cx_lo") == 0L && a.getAs[Long]("cx_hi") == 1L)
    assert(b.getAs[Long]("cluster_id") == 101001000L) // (cx=10, cy=0)
    assert(b.getAs[Long]("n_cells") == 1L && b.getAs[Long]("n_points") == 3L)
  }

  test("gridDensityClusters2d: diagonal cells join one cluster") {
    val pts = Seq.fill(2)((0.5, 0.5)) ++ Seq.fill(2)((1.5, 1.5))
    val df = pts.toDF("x", "y")
    val rows = Stats.gridDensityClusters2d(df, col("x"), col("y"),
      xCell = 1.0, yCell = 1.0, minPtsFrac = 0.75).collect() // thresh 3
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("n_cells") == 2L)
    assert(rows(0).getAs[Long]("n_points") == 4L)
    assert(rows(0).getAs[Long]("cy_lo") == 0L &&
      rows(0).getAs[Long]("cy_hi") == 1L)
  }

  test("sequentialPairs: hand-counted gap-2 pairs over two users") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"),
      (1L, 4L, "C"), (2L, 1L, "A"), (2L, 2L, "B"))
      .map { case (u, s, t) => (u, ts(s), s, t) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val rows = Behavior.sequentialPairs(ev, "user_id", "ts", "event_id",
      "event_type", maxGap = 2).collect()
    val byPair = rows.map(r => (r.getAs[String]("ante"),
      r.getAs[String]("succ")) -> r).toMap
    val ab = byPair(("A", "B"))
    assert(ab.getAs[Long]("n_pairs") == 2L)
    assert(ab.getAs[Long]("n_users") == 2L)
    assert(ab.getAs[Long]("n_ante") == 3L) // A occurs 3x across users
    assert(math.abs(ab.getAs[Double]("avg_follows") - 2.0 / 3.0) < 1e-12)
    assert(byPair(("A", "A")).getAs[Long]("n_pairs") == 1L)
    assert(byPair(("B", "C")).getAs[Long]("n_pairs") == 1L)
    assert(!byPair.contains(("C", "A"))) // C is last, no successors
  }

  test("designEffect: hand Kish numbers") {
    val df = Seq(("g", 1.0, 1.00), ("g", 1.0, 2.00), ("g", 2.0, 3.00))
      .toDF("g", "w", "v")
    val r = Sampling.designEffect(df, "g", col("w"), col("v")).head()
    assert(r.getAs[Long]("n") == 3L)
    assert(math.abs(r.getAs[Double]("n_eff") - 16.0 / 6.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("deff") - 3.0 * 6.0 / 16.0) < 1e-12)
    // weighted mean = (1*100 + 1*200 + 2*300)/4 cents = 2.25 dollars
    assert(math.abs(r.getAs[Double]("weighted_mean") - 2.25) < 1e-12)
  }

  test("huberRegression: outlier is downweighted vs textbook WLS") {
    // y = 10.00 + 2.00x dollars except an outlier spike at the LAST day
    // (an outlier at the center x would leave the OLS slope untouched)
    val ys = Seq(1000L, 1200L, 1400L, 1600L, 1800L, 2000L, 6000L)
    val df = ys.zipWithIndex.map { case (c, i) => ("g", i, c / 100.0) }
      .toDF("g", "i", "v")
      .select(col("g"), date_add(lit("1992-01-01"), col("i")).as("dt"),
        col("v"))
    val r = Ml.huberRegression(df, "g", "dt", "v").head()
    // textbook reference: OLS, then two weighted-OLS rounds
    val xs = (0 until 7).map(_.toDouble)
    val yd = ys.map(_.toDouble)
    val n = 7.0
    def wls(ws: Seq[Double]): (Double, Double) = {
      val sw = ws.sum
      val swx = ws.zip(xs).map { case (w, x) => w * x }.sum
      val swy = ws.zip(yd).map { case (w, y) => w * y }.sum
      val swxx = ws.zip(xs).map { case (w, x) => w * x * x }.sum
      val swxy = ws.zip(xs.zip(yd)).map { case (w, (x, y)) => w * x * y }.sum
      val b = (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
      ((swy - b * swx) / sw, b)
    }
    val (a0, b0) = wls(Seq.fill(7)(1.0))
    val rss = xs.zip(yd).map { case (x, y) =>
      val e = y - a0 - b0 * x; e * e }.sum
    val k = 1.345 * math.sqrt(rss / n) // sigma-hat = sqrt(RSS/n)
    def weights(a: Double, b: Double): Seq[Double] =
      xs.zip(yd).map { case (x, y) =>
        val ab = math.abs(y - a - b * x)
        if (ab <= k) 1.0 else k / ab }
    val (a1, b1) = wls(weights(a0, b0))
    val (a2, b2) = wls(weights(a1, b1))
    assert(math.abs(r.getAs[Double]("b0") - b0) < 1e-6)
    assert(math.abs(r.getAs[Double]("b1") - b1) < 1e-6)
    assert(math.abs(r.getAs[Double]("b2") - b2) < 1e-6)
    assert(math.abs(r.getAs[Double]("a2") - a2) < 1e-4)
    // robustness: the IRLS slope is closer to the clean 200 c/day than OLS
    assert(math.abs(r.getAs[Double]("b2") - 200.0) <
      math.abs(r.getAs[Double]("b0") - 200.0))
  }

  test("quantileGridRegression: hand grid search, tau=0.9") {
    val ys = Seq(0L, 100L, 250L, 300L, 400L)
    val df = ys.zipWithIndex.map { case (c, i) => ("g", i, c / 100.0) }
      .toDF("g", "i", "v")
      .select(col("g"), date_add(lit("1992-01-01"), col("i")).as("dt"),
        col("v"))
    val r = Ml.quantileGridRegression(df, "g", "dt", "v", tau10 = 9,
      slopeLo = 0L, slopeHi = 100L, slopeStep = 50L).head()
    // b=100: residuals {0,0,50,0,0}, a = max = 50, loss = 4*50*1 = 200
    // b=50: a=200, loss=450; b=0: a=400, loss=950
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Long]("slope_c_per_day") == 100L)
    assert(r.getAs[Long]("intercept_c") == 50L)
    assert(r.getAs[Long]("loss10") == 200L)
  }

  test("textRank: two-doc corpus vs independent PageRank") {
    val docs = Seq((1L, "alpha beta gamma alpha"), (2L, "beta alpha beta"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.textRank(docs, "doc_id", "text",
      iters = 5, topK = 10).collect()
    // reference: build window-2 co-occurrence graph by the declared rule
    val toks = Seq(Seq("alpha", "beta", "gamma", "alpha"),
      Seq("beta", "alpha", "beta"))
    val w = scala.collection.mutable.Map.empty[(String, String), Long]
    for (ts <- toks; i <- ts.indices; g <- 1 to 2
         if i + g < ts.size && ts(i) != ts(i + g)) {
      val k = if (ts(i) < ts(i + g)) (ts(i), ts(i + g))
        else (ts(i + g), ts(i))
      w(k) = w.getOrElse(k, 0L) + 1L
    }
    val nodes = w.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    val out = nodes.map(n => n -> w.collect {
      case ((a, b), c) if a == n || b == n => c }.sum).toMap
    var rank = nodes.map(n => n -> 1.0 / nodes.size).toMap
    for (_ <- 1 to 5) {
      val inflow = nodes.map { n =>
        n -> w.collect {
          case ((a, b), c) if a == n => rank(b) * c / out(b)
          case ((a, b), c) if b == n => rank(a) * c / out(a)
        }.sum
      }.toMap
      rank = nodes.map(n =>
        n -> (0.15 / nodes.size + 0.85 * inflow(n))).toMap
    }
    val expected = rank.toSeq.sortBy { case (n, r) => (-r, n) }
    val got = rows.map(r => (r.getAs[String]("word"),
      r.getAs[java.math.BigDecimal]("rank").doubleValue()))
    assert(got.map(_._1).toSeq == expected.map(_._1))
    got.zip(expected).foreach { case ((_, g), (_, e)) =>
      assert(math.abs(g - e) < 1e-9) }
    // alpha and beta are the hubs; gamma trails
    assert(got.last._1 == "gamma")
  }

  test("loessGrid: exact line is reproduced at every grid point") {
    // y = 2.00 + 0.10x dollars; tricube-weighted OLS of exact linear
    // data returns the line regardless of the weights
    val df = (0 to 10).map(i => ("g", i, (200.0 + 10.0 * i) / 100.0))
      .toDF("g", "i", "v")
      .select(col("g"), date_add(lit("1992-01-01"), col("i")).as("dt"),
        col("v"))
    val rows = Stats.loessGrid(df, "g", "dt", "v", gridStep = 5L,
      bandwidth = 6.0).collect()
    assert(rows.length == 3) // x0 = 0, 5, 10
    rows.foreach { r =>
      val x0 = r.getAs[Long]("x0")
      assert(r.getAs[Long]("n_local") >= 3L)
      assert(math.abs(r.getAs[Double]("yhat")
        - (200.0 + 10.0 * x0) / 100.0) < 1e-9, s"at x0=$x0")
    }
  }

  test("markovPredictability: A,B,A,C chain by hand") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"),
      (1L, 4L, "C")).map { case (u, s, t) => (u, ts(s), s, t) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val rows = Behavior.markovPredictability(ev, "ts", "user_id",
      "event_type", "event_id", gapSeconds = 1800L).collect()
    val byState = rows.map(r => r.getAs[String]("state") -> r).toMap
    // transitions: A->B, B->A, A->C; H(next|A)=1 bit, H(next|B)=0
    assert(math.abs(byState("A").getAs[Double]("h_given_bits") - 1.0)
      < 1e-12)
    assert(math.abs(byState("B").getAs[Double]("h_given_bits")) < 1e-12)
    val hm = math.log(3.0) / math.log(2.0) // next is uniform over 3
    assert(math.abs(byState("A").getAs[Double]("h_next_bits") - hm)
      < 1e-12)
    val all = byState("ALL")
    assert(all.getAs[Long]("n") == 3L)
    assert(math.abs(all.getAs[Double]("h_given_bits") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(all.getAs[Double]("info_gain_bits")
      - (hm - 2.0 / 3.0)) < 1e-12)
  }

  test("unigramLmCost: two-word corpus, hand Viterbi") {
    // words: "aa" (c=1), "ab" (c=1); substring counts a=3, b=1, aa=1,
    // ab=1 (tot 6); costs in micro-bits: a=1e6, b=aa=ab=floor(1e6*log2 6)
    val docs = Seq((1L, "aa ab")).toDF("doc_id", "text")
    val rows = TextAnalysis.unigramLmCost(docs, "text", maxPieceLen = 4,
      vocabTop = 200, maxWordLen = 20).collect()
    val cA = 1000000L
    val cRare = math.floor(-1e6 * math.log(1.0 / 6.0) / math.log(2.0)).toLong
    // "aa": min(a+a, aa) = 2e6; "ab": min(a+b, ab) = cRare (single piece)
    val best = 2 * cA + math.min(cA + cRare, cRare)
    val byLen = rows.map(r => r.getAs[Long]("word_len") -> r).toMap
    val l2 = byLen(2L)
    assert(l2.getAs[Long]("n_words") == 2L)
    assert(l2.getAs[Long]("n_tokens") == 2L)
    assert(math.abs(l2.getAs[Double]("bits_per_char")
      - best.toDouble / 4.0 / 1e6) < 1e-9)
    assert(byLen(0L).getAs[Long]("n_words") == 2L) // ALL row
  }

  test("dispersionIndex: zero-filled grid, hand moments") {
    def ts(day: Int, k: Int): Seq[java.sql.Timestamp] =
      Seq.fill(k)(java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(1992, 1, 1).plusDays(day).atStartOfDay()))
    // counts per day: day0=3, day1=0 (gap!), day2=1 -> n=3, s=4
    val ev = (ts(0, 3) ++ ts(2, 1)).map(t => ("t", t))
      .toDF("event_type", "ts")
    val r = Stats.dispersionIndex(ev, "event_type", "ts").head()
    assert(r.getAs[Long]("n_days") == 3L)
    val mean = 4.0 / 3.0
    val varr = (Seq(3.0, 0.0, 1.0).map(k => (k - mean) * (k - mean)).sum) / 2
    assert(math.abs(r.getAs[Double]("mean_per_day") - mean) < 1e-12)
    assert(math.abs(r.getAs[Double]("var_per_day") - varr) < 1e-12)
    assert(math.abs(r.getAs[Double]("dispersion") - varr / mean) < 1e-12)
    assert(math.abs(r.getAs[Double]("chi2") - 2 * varr / mean) < 1e-12)
  }

  test("sessionGapSweep: hand session counts at two thresholds") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq((1L, 0L), (1L, 100L), (1L, 2000L), (2L, 0L))
      .map { case (u, s) => (u, ts(s), s) }
      .toDF("user_id", "ts", "event_id")
    val rows = Behavior.sessionGapSweep(ev, "ts", "user_id", "event_id",
      Seq(60L, 1000L)).collect()
    val byT = rows.map(r => r.getAs[Long]("threshold_s") -> r).toMap
    // gaps for user1: 100 s, 1900 s; user2 none
    assert(byT(60L).getAs[Long]("n_sessions") == 4L)
    assert(math.abs(byT(60L).getAs[Double]("avg_events_per_session")
      - 1.0) < 1e-12)
    assert(byT(1000L).getAs[Long]("n_sessions") == 3L)
    assert(math.abs(byT(1000L).getAs[Double]("avg_events_per_session")
      - 4.0 / 3.0) < 1e-12)
  }

  test("frequencyMovers: hand two-proportion z on a 2-key split") {
    // key 10: 10 early, 0 late (drops out); key 20: 10 early, 10 late
    val rows0 = Seq.fill(10)((10L, 0)) ++ Seq.fill(10)((20L, 0)) ++
      Seq.fill(10)((20L, 400))
    val df = rows0.toDF("k", "i")
      .select(col("k"), date_add(lit("1992-01-01"), col("i")).as("dt"))
    val out = Stats.frequencyMovers(df, "k", "dt", "1992-06-01",
      zMin = 2.0).collect()
    assert(out.length == 2)
    val se = math.sqrt((1.0 / 3) * (2.0 / 3) * (1.0 / 20 + 1.0 / 10))
    val byK = out.map(r => r.getAs[Long]("k") -> r).toMap
    assert(math.abs(byK(10L).getAs[Double]("z") - (0.0 - 0.5) / se)
      < 1e-12)
    val seB = math.sqrt((2.0 / 3) * (1.0 / 3) * (1.0 / 20 + 1.0 / 10))
    assert(math.abs(byK(20L).getAs[Double]("z") - (1.0 - 0.5) / seB)
      < 1e-12)
  }

  test("neweyWestTrend: textbook HAC sandwich on alternating noise") {
    val noise = Seq(50L, -50L, 50L, -50L, 50L, -50L, 50L, -50L, 50L, -40L)
    val ys = (0 until 10).map(i => 1000L + 100L * i + noise(i))
    val df = ys.zipWithIndex.map { case (c, i) => ("g", i, c / 100.0) }
      .toDF("g", "i", "v")
      .select(col("g"), date_add(lit("1992-01-01"), col("i")).as("dt"),
        col("v"))
    val r = Stats.neweyWestTrend(df, "g", "dt", "v", maxLag = 3).head()
    // textbook: OLS fit, floored residuals, u = (x - xbar)e,
    // V = (S0 + 2 sum w_l S_l) / Sxx^2
    val xs = (0 until 10).map(_.toDouble)
    val yd = ys.map(_.toDouble)
    val (b, _) = olsSlopeT(xs, yd)
    val a = yd.sum / 10 - b * xs.sum / 10
    val e = (0 until 10).map(i => math.floor(yd(i) - a - b * xs(i)))
    val xbar = xs.sum / 10
    val u = (0 until 10).map(i => (xs(i) - xbar) * e(i))
    val sxx = xs.map(x => (x - xbar) * (x - xbar)).sum
    def sl(l: Int) = (l until 10).map(t => u(t) * u(t - l)).sum
    val v = (sl(0) + (1 to 3).map(l =>
      2.0 * (1.0 - l / 4.0) * sl(l)).sum) / (sxx * sxx)
    assert(math.abs(r.getAs[Double]("slope") - b) < 1e-9)
    assert(math.abs(r.getAs[Double]("se_nw") - math.sqrt(v)) < 1e-6)
    assert(math.abs(r.getAs[Double]("t_nw") - b / math.sqrt(v)) < 1e-4)
  }

  test("quantileShiftProfile: doubled late distribution, hand deciles") {
    // early values 1..10 dollars, late 2,4,..,20 -> every decile doubles
    val rows0 = (1 to 10).map(v => (0, v.toDouble)) ++
      (1 to 10).map(v => (400, 2.0 * v))
    val df = rows0.toDF("i", "v")
      .select(date_add(lit("1992-01-01"), col("i")).as("dt"), col("v"))
    val out = Stats.quantileShiftProfile(df, col("v"), "dt",
      "1992-06-01", nQ = 10).collect()
    assert(out.length == 9)
    out.foreach { r =>
      val d = r.getAs[Long]("decile")
      assert(r.getAs[Long]("q_early_c") == 100L * d)
      assert(r.getAs[Long]("q_late_c") == 200L * d)
      assert(r.getAs[Long]("shift_c") == 100L * d)
      assert(math.abs(r.getAs[Double]("shift_frac") - 1.0) < 1e-12)
    }
  }

  test("embeddingIsotropy: orthonormal pair by hand") {
    val df = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.embeddingIsotropy(df, "embedding").head()
    assert(r.getAs[Long]("dims") == 2L && r.getAs[Long]("n_vectors") == 2L)
    assert(math.abs(r.getAs[Double]("mean_norm_sq") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("avg_norm_sq") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean_share") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("participation_dims") - 2.0) < 1e-12)
  }

  test("exponentialHazard: three customers, hand rates") {
    val orders = Seq((1L, 0), (1L, 100), (2L, 390), (2L, 400), (3L, 0))
      .toDF("c", "i")
      .select(col("c"), date_add(lit("1992-01-01"), col("i")).as("dt"))
    val segs = Seq((1L, "X"), (2L, "X"), (3L, "Y")).toDF("ck", "seg")
    val rows = Stats.exponentialHazard(orders, "c", "dt", segs, "ck",
      "seg", churnDays = 180L).collect()
    val byS = rows.map(r => r.getAs[String]("seg") -> r).toMap
    // mxd=400; churned iff last < 220: cust1 (ld 100) and cust3 (ld 0)
    val x = byS("X")
    assert(x.getAs[Long]("n_cust") == 2L)
    assert(x.getAs[Long]("n_churned") == 1L)
    assert(x.getAs[Long]("exposure_days") == 101L + 11L)
    val lamX = 1.0 / 112.0; val lamAll = 2.0 / 113.0
    assert(math.abs(x.getAs[Double]("hazard_ratio") - lamX / lamAll)
      < 1e-12)
    val y = byS("Y")
    assert(y.getAs[Long]("exposure_days") == 1L)
    assert(math.abs(y.getAs[Double]("lambda_per_kday") - 1000.0) < 1e-9)
  }

  test("truncationLoss: hand token-loss at one budget") {
    val docs = Seq((1L, "a b"), (2L, "a b c d e")).toDF("doc_id", "text")
    val r = TextAnalysis.truncationLoss(docs, "text", Seq(3L)).head()
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("n_docs_over") == 1L)
    assert(math.abs(r.getAs[Double]("frac_docs_over") - 0.5) < 1e-12)
    assert(r.getAs[Long]("n_tokens") == 7L)
    assert(r.getAs[Long]("tokens_lost") == 2L)
    assert(math.abs(r.getAs[Double]("frac_tokens_lost") - 2.0 / 7.0)
      < 1e-12)
  }

  test("cochranQ: textbook 3x3 matrix gives Q = 3") {
    // rows s1=(1,1,0) s2=(1,0,0) s3=(1,1,1): C=(3,2,1), R=(2,1,3), Q=3;
    // subject 4 has no observations (all-zero row changes nothing)
    val obs = Seq((1L, "t1"), (1L, "t2"), (2L, "t1"), (3L, "t1"),
      (3L, "t2"), (3L, "t3")).toDF("s", "t")
    val subjects = Seq(1L, 2L, 3L, 4L).toDF("sk")
    val r = Ml.cochranQ(obs, "s", "t", subjects, "sk").head()
    assert(r.getAs[Long]("n_subjects") == 4L)
    assert(r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("dof") == 2L)
    assert(math.abs(r.getAs[Double]("q_stat") - 3.0) < 1e-12)
  }

  test("kendallsW: perfect agreement = 1, symmetric disagreement = 0") {
    val agree = Seq((1, "a", 1L), (1, "b", 2L), (1, "c", 3L),
      (2, "a", 1L), (2, "b", 2L), (2, "c", 3L)).toDF("j", "it", "v")
    val r1 = Ml.kendallsW(agree, "j", "it", col("v")).head()
    assert(r1.getAs[Long]("n_judges") == 2L)
    assert(r1.getAs[Long]("n_items") == 3L)
    assert(math.abs(r1.getAs[Double]("w") - 1.0) < 1e-12)
    val disagree = Seq((1, "a", 1L), (1, "b", 2L), (1, "c", 3L),
      (2, "a", 3L), (2, "b", 2L), (2, "c", 1L)).toDF("j", "it", "v")
    val r2 = Ml.kendallsW(disagree, "j", "it", col("v")).head()
    assert(math.abs(r2.getAs[Double]("w")) < 1e-12)
  }

  test("greedyKCenter: four planted points, hand radius curve") {
    val df = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.1f, 0.0f)),
      (3L, Array(0.4f, 0.0f)), (4L, Array(0.2f, 0.2f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.greedyKCenter(df, "vec_id", "embedding", k = 3)
      .collect()
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 3L, 4L))
    assert(rows(0).isNullAt(rows(0).fieldIndex("radius2")))
    // round 2 picks the farthest from the seed (0.4^2 = 0.16); round 3
    // picks v4 whose min distance to {v1,v3} is 0.08
    assert(math.abs(rows(1).getAs[Double]("radius2") - 0.16) < 1e-7)
    assert(math.abs(rows(2).getAs[Double]("radius2") - 0.08) < 1e-7)
  }

  test("herfindahl: hand shares in two markets") {
    // market A: members with 3.00 and 1.00 -> shares .75/.25,
    // HHI = .625, eff = 1.6; market B: one member -> HHI = 1, eff = 1
    val df = Seq(("A", 1L, 3.00), ("A", 2L, 1.00), ("B", 3L, 2.00))
      .toDF("mkt", "mem", "v")
    val rows = Stats.herfindahl(df, "mkt", "mem", col("v")).collect()
    val byM = rows.map(r => r.getAs[String]("mkt") -> r).toMap
    assert(byM("A").getAs[Long]("n_members") == 2L)
    assert(math.abs(byM("A").getAs[Double]("hhi") - 0.625) < 1e-12)
    assert(math.abs(byM("A").getAs[Double]("effective_members") - 1.6)
      < 1e-12)
    assert(math.abs(byM("B").getAs[Double]("hhi") - 1.0) < 1e-12)
  }

  test("coverageCounts: hand N50/N80 over four members") {
    // shares 40/30/20/10 -> n50 = 2 (40+30), n80 = 3, n95 = 4
    val df = Seq(("A", 1L, 4.00), ("A", 2L, 3.00), ("A", 3L, 2.00),
      ("A", 4L, 1.00)).toDF("mkt", "mem", "v")
    val r = Stats.coverageCounts(df, "mkt", "mem", col("v"),
      Seq(50, 80, 95)).head()
    assert(r.getAs[Long]("n_members") == 4L)
    assert(r.getAs[Long]("n50") == 2L)
    assert(r.getAs[Long]("n80") == 3L)
    assert(r.getAs[Long]("n95") == 4L)
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
