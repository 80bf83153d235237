package graft

import graft.operators.{Dedup, Ml, Stats}

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth toy-fixture tests for the round-9b operator batch
  * (q339–q347) — independent of the SQL-mirror oracle (which proves
  * Spark≡DuckDB, not that the algebra is the intended statistic). */
class Round9bOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("gTest: hand-computed 2x2 log-likelihood ratio") {
    // table [[10, 20], [30, 40]]: margins ra = 30/70, cb = 40/60, n = 100
    val df = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))).toDF("u", "v")
    val r = Stats.gTest(df, "u", "v").head()
    val e = Seq((10.0, 30.0 * 40 / 100), (20.0, 30.0 * 60 / 100),
      (30.0, 70.0 * 40 / 100), (40.0, 70.0 * 60 / 100))
    val g = 2.0 * e.map { case (o, ee) => o * math.log(o / ee) }.sum
    assert(math.abs(r.getAs[Double]("g_stat") - g) < 1e-9)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Long]("n") == 100L)
  }

  test("energyDistanceDrift: two tiny halves, all-pairs means by hand") {
    // A = {1.00, 2.00} (early), B = {1.00, 3.00} (late):
    // E|X-Y| = (0+200+100+100)/4 c = 1.00 $; E|X-X'| = 2*100/4 c = .50 $;
    // E|Y-Y'| = 2*200/4 c = 1.00 $; D^2 = 2*1.0 - 0.5 - 1.0 = 0.5
    val ev = Seq((ts(0), "t", 1.00), (ts(1), "t", 2.00),
      (ts(100), "t", 1.00), (ts(101), "t", 3.00))
      .toDF("ts", "event_type", "value")
    val r = Ml.energyDistanceDrift(ev, "ts", "event_type", "value").head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(math.abs(r.getAs[Double]("e_xy") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("e_xx") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("e_yy") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("energy") - 0.5) < 1e-12)
  }

  test("cramerVonMisesDrift: pooled-CDF sum by hand") {
    // same fixture: S = sum (a+b)*(cumA*m - cumB*n)^2 = 0 + 1*4 + 0 = 4;
    // T = S / (N^2 * n * m) = 4 / (16 * 4) = 0.0625
    val ev = Seq((ts(0), "t", 1.00), (ts(1), "t", 2.00),
      (ts(100), "t", 1.00), (ts(101), "t", 3.00))
      .toDF("ts", "event_type", "value")
    val r = Ml.cramerVonMisesDrift(ev, "ts", "event_type", "value").head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(math.abs(r.getAs[Double]("t_stat") - 0.0625) < 1e-12)
  }

  test("cvm and energy vanish when the halves are identical") {
    val ev = (0 until 8).map { i =>
      (ts(i * 10L), "t", 1.00 + (i % 4)) // same 4 values in each half
    }.toDF("ts", "event_type", "value")
    val c = Ml.cramerVonMisesDrift(ev, "ts", "event_type", "value").head()
    assert(math.abs(c.getAs[Double]("t_stat")) < 1e-15)
    val e = Ml.energyDistanceDrift(ev, "ts", "event_type", "value").head()
    assert(math.abs(e.getAs[Double]("energy")) < 1e-12)
  }

  test("ar2YuleWalker: alternating series has rho1=-5/6, rho2=2/3") {
    val days = Seq("1992-01-01", "1992-01-02", "1992-01-03", "1992-01-04",
      "1992-01-05", "1992-01-06")
    val df = days.zipWithIndex
      .map { case (d, i) => (d, if (i % 2 == 0) 0.00 else 1.00) }
      .toDF("ds", "v")
      .select(to_date(col("ds")).as("d"), col("v"))
    val r = Stats.ar2YuleWalker(df, "d", "v").head()
    assert(r.getAs[Long]("n") == 6L)
    assert(math.abs(r.getAs[Double]("rho1") - (-5.0 / 6)) < 1e-12)
    assert(math.abs(r.getAs[Double]("rho2") - 2.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("phi1") - (-10.0 / 11)) < 1e-12)
    assert(math.abs(r.getAs[Double]("phi2") - (-1.0 / 11)) < 1e-12)
    // x_last = 1.00, x_prev = 0.00, mu = .5:
    // f1 = .5 - (10/11)(.5) + (1/11)(.5) = 1/11
    assert(math.abs(r.getAs[Double]("forecast_1") - 1.0 / 11) < 1e-12)
  }

  test("grangerScreen: y_t = 100*x_{t-1} makes x->y full SSR vanish") {
    // hourly x counts [1,0,2,0,3,0]; y value (dollars) = x one hour back
    val xs = Seq(0 -> 1, 2 -> 2, 4 -> 3).flatMap { case (h, k) =>
      Seq.fill(k)((ts(h * 3600L), "x", 0.0))
    }
    val ys = Seq(1 -> 1.0, 3 -> 2.0, 5 -> 3.0).map { case (h, v) =>
      (ts(h * 3600L), "y", v)
    }
    val ev = (xs ++ ys).toDF("ts", "event_type", "value")
    val out = Stats.grangerScreen(ev, "ts",
      col("event_type") === "x", lit(1L),
      col("event_type") === "y",
      (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => r.getAs[String]("direction") -> r).toMap
    assert(out.size == 2)
    val xy = out("x_to_y")
    assert(xy.getAs[Long]("m") == 5L)
    assert(math.abs(xy.getAs[Double]("ssr_full")) < 1e-9,
      s"exact-causation fit must have zero residual: $xy")
    assert(xy.getAs[Double]("ssr_restricted") > 0.1)
    // exact fit -> the perfect-fit guard nulls F (or leaves it huge if
    // rounding keeps ssr_f infinitesimally positive)
    assert(xy.isNullAt(xy.fieldIndex("f_stat")) ||
      xy.getAs[Double]("f_stat") > 1e3)
  }

  test("esdOutliers: removal order and shrinking moments") {
    val df = Seq((1L, 10.00), (2L, 10.00), (3L, 10.00), (4L, 10.00),
      (5L, 100.00), (6L, 90.00)).toDF("k", "v")
      .withColumn("g", lit("a"))
    val rows = Stats.esdOutliers(df, "g", "v", "k", rounds = 3)
      .orderBy("round").collect()
    assert(rows.map(_.getAs[Long]("outlier_key")).toSeq == Seq(5L, 6L, 1L))
    assert(rows.map(_.getAs[Long]("n")).toSeq == Seq(6L, 5L, 4L))
    assert(rows.map(_.getAs[Double]("outlier_value")).toSeq ==
      Seq(100.0, 90.0, 10.0))
    // round-2 mean excludes the removed 100$: (4*10 + 90)/5 = 26
    assert(math.abs(rows(1).getAs[Double]("mean") - 26.0) < 1e-12)
    // round 3 is the all-equal degenerate: zero spread -> R is NULL
    assert(rows(2).isNullAt(rows(2).fieldIndex("r_stat")))
    // masking released: removing the 100$ point makes 90$ MORE extreme
    assert(rows(1).getAs[Double]("r_stat") > rows(0).getAs[Double]("r_stat"))
  }

  test("bhFdr: the textbook step-up example") {
    val p = Seq(("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.5))
      .toDF("g", "p_value")
    val rows = Ml.bhFdr(p, "g", "p_value", alpha = 0.05)
      .orderBy("rank").collect()
    assert(rows.map(_.getAs[Double]("p_adj")).toSeq ==
      Seq(0.04, 0.04, 0.04, 0.5))
    assert(rows.map(_.getAs[Long]("reject")).toSeq == Seq(1L, 1L, 1L, 0L))
  }

  test("alsRecommendTopK: seen items are excluded, ranks are dense") {
    val ratings = Seq((1L, 10L, 5L), (1L, 20L, 3L), (2L, 10L, 4L),
      (2L, 30L, 1L)).toDF("u", "i", "r")
    val out = Ml.alsRecommendTopK(ratings, "u", "i", "r", rounds = 1,
      nUsers = 2, k = 2).collect()
    val byUser = out.groupBy(_.getAs[Long]("custkey"))
    // items {10,20,30}: u1 saw {10,20} -> only 30; u2 saw {10,30} -> 20
    assert(byUser(1L).map(_.getAs[Long]("partkey")).toSet == Set(30L))
    assert(byUser(2L).map(_.getAs[Long]("partkey")).toSet == Set(20L))
    assert(out.forall(_.getAs[Long]("rank") == 1L))
  }

  test("andersonDarlingDrift: single informative cell by hand") {
    // cells (a,b): 100c->(1,1), 200c->(1,0), 300c->(0,1); only the
    // 200c cell contributes: gap = 2, term = 1*4/(2*2*3*1) = 1/3
    val ev = Seq((ts(0), "t", 1.00), (ts(1), "t", 2.00),
      (ts(100), "t", 1.00), (ts(101), "t", 3.00))
      .toDF("ts", "event_type", "value")
    val r = Ml.andersonDarlingDrift(ev, "ts", "event_type", "value").head()
    assert(math.abs(r.getAs[Double]("ad_stat") - 1.0 / 3) < 1e-12)
  }

  test("bartlett: two 2-point groups against the closed form") {
    val df = Seq(("a", 1.00), ("a", 3.00), ("b", 1.00), ("b", 5.00))
      .toDF("g", "v")
    val r = Ml.bartlett(df, "g", "v").head()
    // SSW (cents^2): a -> 20000, b -> 80000; pooled = 50000
    val b = 2 * math.log(50000.0) -
      (math.log(20000.0) + math.log(80000.0))
    val c = 1.0 + ((1.0 + 1.0) - 0.5) / 3.0
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("dof") == 1L)
    assert(math.abs(r.getAs[Double]("chi2_bartlett") - b / c) < 1e-9)
  }

  test("sesAlphaSweep: a constant series is a zero-error fixed point") {
    val days = (1 to 5).map(i => (f"1992-01-$i%02d", 2.00))
    val df = days.toDF("ds", "v")
      .select(to_date(col("ds")).as("d"), col("v"))
    val rows = Stats.sesAlphaSweep(df, "d", "v")
      .orderBy("alpha_quarters").collect()
    assert(rows.map(_.getAs[Long]("alpha_quarters")).toSeq == Seq(1L, 2L, 3L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") == 5L)
      assert(r.getAs[Double]("level_final") == 2.0)
      assert(r.getAs[Double]("sae_total") == 0.0)
    }
  }

  test("hurstRs: trending ramp persists, alternating series does not") {
    def series(f: Int => Double) = (0 until 256).map { t =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(1992, 1, 1)
        .plusDays(t.toLong)), f(t))
    }.toDF("d", "v")
    val ramp = Stats.hurstRs(series(t => t.toDouble), "d", "v").collect()
    assert(ramp.length == 4)
    assert(ramp.head.getAs[Double]("hurst") > 0.7,
      s"ramp should persist: ${ramp.head.getAs[Double]("hurst")}")
    val alt = Stats.hurstRs(series(t => 2.0 * (t % 2)), "d", "v").collect()
    assert(alt.head.getAs[Double]("hurst") < 0.3,
      s"alternation should anti-persist: ${alt.head.getAs[Double]("hurst")}")
  }

  test("trimmedMean: one outlier per tail dies, raw mean keeps it") {
    val df = (Seq.fill(9)(1.00) :+ 100.00).toDF("v")
      .withColumn("g", lit("a"))
    val r = Stats.trimmedMean(df, "g", "v").head()
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("trimmed_each_side") == 1L)
    assert(r.getAs[Double]("trimmed_mean") == 1.0)
    assert(math.abs(r.getAs[Double]("raw_mean") - 10.9) < 1e-12)
  }

  test("negativeSamplingTable: unigram^0.75 mass dominates the draws") {
    val docs = Seq(Tuple1((Seq.fill(50)("aa").mkString(" ")) + " bb"))
      .toDF("text")
    val out = graft.operators.TextAnalysis
      .negativeSamplingTable(docs, "text", nDraws = 1000, topK = 10)
      .collect()
    assert(out.map(_.getAs[Long]("n_sampled")).sum == 1000L)
    val top = out.head
    assert(top.getAs[String]("token") == "aa")
    assert(top.getAs[Long]("n_sampled") > 800L)
    // share = 50^.75 / (50^.75 + 1) ~ 0.9495
    assert(math.abs(top.getAs[Double]("weight_share") - 0.9495) < 0.01)
  }

  test("icc1: perfectly separated groups give ICC = 1") {
    val df = Seq(("a", 1.00), ("a", 1.00), ("b", 9.00), ("b", 9.00))
      .toDF("g", "v")
    val r = Ml.icc1(df, "g", "v").head()
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("n0") == 2.0)
    assert(r.getAs[Double]("msw") == 0.0)
    assert(r.getAs[Double]("icc") == 1.0)
  }

  test("simpsonsScreen: the textbook two-strata reversal") {
    // within each stratum slope = -1; across strata the offsets flip it
    val df = Seq(("A", 1.00, 10.00), ("A", 2.00, 9.00),
      ("B", 5.00, 20.00), ("B", 6.00, 19.00)).toDF("s", "x", "y")
    val r = Stats.simpsonsScreen(df, "x", "y", Seq("s")).head()
    assert(r.getAs[Long]("k_strata") == 2L && r.getAs[Long]("n") == 4L)
    assert(math.abs(r.getAs[Double]("slope_within") - (-1.0)) < 1e-12)
    assert(math.abs(r.getAs[Double]("slope_marginal") - 39.0 / 17.0) < 1e-12)
    assert(r.getAs[Long]("sign_reversed") == 1L)
  }

  test("trainingDataMap: buckets partition the rows, confident side high") {
    val df = (0 until 200).map { i =>
      val x1 = i % 101
      (if (x1 > 50) 1L else 0L, x1.toLong, (i % 7).toLong)
    }.toDF("y", "x1", "x2")
    val rows = Ml.trainingDataMap(df, "y", "x1", "x2", iters = 12)
      .collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == 200L)
    assert(rows.map(_.getAs[Long]("n_signatures")).sum >= 101L)
    val top = rows.maxBy(_.getAs[Long]("bucket"))
    assert(top.getAs[Double]("avg_confidence") > 0.5,
      s"separable data must have a confident bucket: ${top}")
    rows.foreach { r =>
      val c = r.getAs[Double]("avg_confidence")
      assert(c >= 0.0 && c <= 1.0)
      assert(r.getAs[Double]("avg_variability") >= 0.0)
    }
  }

  test("dedupThresholdSweep: monotone counts, exact copy at every cut") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact copy of 1
      (3L, "alpha beta gamma delta eta theta iota"),
      (4L, "alpha beta gamma delta eta kappa lambda"),
      (5L, "mu nu xi omicron pi rho sigma"))
      .toDF("doc_id", "text")
    val rows = Dedup.dedupThresholdSweep(docs, "doc_id", "text")
      .orderBy("threshold_pct").collect()
    assert(rows.map(_.getAs[Long]("threshold_pct")).toSeq ==
      Seq(50L, 60L, 70L, 80L, 90L))
    val np = rows.map(_.getAs[Long]("n_pairs"))
    assert(np.zip(np.tail).forall { case (a, b) => a >= b },
      s"pair counts must fall as the cut rises: ${np.toSeq}")
    assert(np.last >= 1L, "the exact copy must survive the 90% cut")
    val nd = rows.map(_.getAs[Long]("n_docs_in_pairs"))
    assert(nd.zip(nd.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(r => r.getAs[Long]("n_docs_in_pairs") <= 5L))
  }

  test("matthewsCorrelation: perfect, inverted and constant classifiers") {
    val mk = (y: Int, p: Int, k: Int) => Seq.fill(k)(("s", y == 1, p == 1))
    // 10 TP + 10 TN -> MCC = 1; flip predictions -> MCC = -1
    val perfect = (mk(1, 1, 10) ++ mk(0, 0, 10)).toDF("g", "y", "p")
    val r1 = Ml.matthewsCorrelation(perfect, "g", col("y"), col("p"))
      .filter(col("slice") === "ALL").head()
    assert(r1.getAs[Double]("mcc") == 1.0 && r1.getAs[Double]("f1") == 1.0)
    val inverted = (mk(1, 0, 10) ++ mk(0, 1, 10)).toDF("g", "y", "p")
    val r2 = Ml.matthewsCorrelation(inverted, "g", col("y"), col("p"))
      .filter(col("slice") === "ALL").head()
    assert(r2.getAs[Double]("mcc") == -1.0)
    // constant predictor: denominator zero -> MCC null, recall defined
    val const = (mk(1, 1, 5) ++ mk(0, 1, 15)).toDF("g", "y", "p")
    val r3 = Ml.matthewsCorrelation(const, "g", col("y"), col("p"))
      .filter(col("slice") === "ALL").head()
    assert(r3.isNullAt(r3.fieldIndex("mcc")))
    assert(r3.getAs[Double]("recall") == 1.0)
    assert(r3.getAs[Double]("precision") == 0.25)
  }

  test("oddsRatio: hand 2x2 and the empty-cell NULL contract") {
    // a=20 b=10 c=5 d=40 -> OR = 16; se = sqrt(1/20+1/10+1/5+1/40)
    val rows = Seq.fill(20)((true, true)) ++ Seq.fill(10)((true, false)) ++
      Seq.fill(5)((false, true)) ++ Seq.fill(40)((false, false))
    val df = rows.toDF("e", "y").withColumn("g", lit("s"))
    val r = Ml.oddsRatio(df, "g", col("e"), col("y")).head()
    assert(r.getAs[Double]("odds_ratio") == 16.0)
    val se = math.sqrt(1.0 / 20 + 1.0 / 10 + 1.0 / 5 + 1.0 / 40)
    assert(math.abs(r.getAs[Double]("ci_lo") -
      math.exp(math.log(16.0) - 1.96 * se)) < 1e-12)
    assert(math.abs(r.getAs[Double]("ci_hi") -
      math.exp(math.log(16.0) + 1.96 * se)) < 1e-12)
    val degenerate = Seq((true, true), (false, false))
      .toDF("e", "y").withColumn("g", lit("s"))
    val r2 = Ml.oddsRatio(degenerate, "g", col("e"), col("y")).head()
    assert(r2.isNullAt(r2.fieldIndex("odds_ratio")))
  }

  test("incrementalDedup: exact copy dropped, unique doc kept") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (7L, "the quick brown fox jumps over the lazy dog"), // copy of 1
      (17L, "sphinx of black quartz judge my vow tonight")) // unique
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(docs, "doc_id", "text",
      col("doc_id") % 10 === 7)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(7L, 17L))
    assert(out(7L).getAs[Long]("is_kept") == 0L)
    assert(out(7L).getAs[Long]("dup_of") == 1L)
    assert(out(17L).getAs[Long]("is_kept") == 1L)
    assert(out(17L).isNullAt(out(17L).fieldIndex("dup_of")))
  }
}
