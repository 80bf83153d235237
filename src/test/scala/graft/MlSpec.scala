package graft

import graft.operators.Ml

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Feature-engineering operators: out-of-fold target encoding, Spearman
  * rank correlation, mutual information — hand-checkable laws on tiny
  * frames (the DuckDB gate covers fixture-scale values). */
class MlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  test("targetEncoding: each fold's encoding excludes its own rows") {
    import spark.implicits._
    // cat A: fold0 rows {10.00, 30.00}, fold1 row {20.00}
    val df = Seq((0L, "A", 10.0), (5L, "A", 30.0), (1L, "A", 20.0))
      .toDF("k", "cat", "t")
    val enc = Ml.targetEncoding(df, "cat", "t", "k", nFolds = 5)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    assert(enc(0L) == 20.0) // leaves out folds-0 rows → mean(20) = 20
    assert(enc(1L) == 20.0) // leaves out 20 → mean(10,30) = 20
  }

  test("targetEncoding: single-fold category drops (OOF undefined)") {
    import spark.implicits._
    val df = Seq((0L, "A", 10.0), (5L, "A", 30.0)).toDF("k", "cat", "t")
    assert(Ml.targetEncoding(df, "cat", "t", "k", 5).count() == 0)
  }

  test("spearman: perfect monotone = 1, reversed = -1, invariant to " +
      "monotone rescaling") {
    import spark.implicits._
    val up = Seq(("g", 1L, 1.0), ("g", 2L, 100.0), ("g", 3L, 101.0),
      ("g", 4L, 1e9)).toDF("g", "x", "y")
    val r1 = Ml.spearman(up, "g", "x", "y").head().getDouble(2)
    assert(r1 == 1.0)
    val down = up.selectExpr("g", "x", "-y AS y")
    assert(Ml.spearman(down, "g", "x", "y").head().getDouble(2) == -1.0)
  }

  test("spearman: ties get average ranks (known small case)") {
    import spark.implicits._
    // x = 1,2,3,4 ; y = 1,1,2,3: ranks y = 1.5,1.5,3,4 vs x = 1,2,3,4
    // → cov = 4.5, vx = 5, vy = 4.5 → rho = √0.9
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 1.0), ("g", 3L, 2.0),
      ("g", 4L, 3.0)).toDF("g", "x", "y")
    val rho = Ml.spearman(df, "g", "x", "y").head().getDouble(2)
    assert(math.abs(rho - 0.9486832980505138) < 1e-12)
  }

  test("spearman: zero-variance group is excluded") {
    import spark.implicits._
    val df = Seq(("g", 1L, 5.0), ("g", 2L, 5.0)).toDF("g", "x", "y")
    assert(Ml.spearman(df, "g", "x", "y").count() == 0)
  }

  test("mutualInformation: independent columns → MI 0, identical → H") {
    import spark.implicits._
    // perfectly independent 2×2 uniform grid
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("u", "v")
    val r0 = Ml.mutualInformation(ind, "u", "v").head()
    assert(math.abs(r0.getAs[Double]("mi_nats")) < 1e-12)
    assert(math.abs(r0.getAs[Double]("h_a") - math.log(2)) < 1e-12)
    // identical columns: MI = H(a), NMI = 1
    val same = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("c", "c"))
      .toDF("u", "v")
    val r1 = Ml.mutualInformation(same, "u", "v").head()
    assert(math.abs(r1.getAs[Double]("mi_nats") -
      r1.getAs[Double]("h_a")) < 1e-12)
    assert(math.abs(r1.getAs[Double]("nmi") - 1.0) < 1e-12)
  }

  test("mannWhitney: hand-checked no-tie case") {
    import spark.implicits._
    // A = {1,2}, B = {3,4,5}: R1 = 1+2 = 3, U1 = 3 - 3 = 0
    val df = Seq(("g", 1.0, true), ("g", 2.0, true), ("g", 3.0, false),
      ("g", 4.0, false), ("g", 5.0, false)).toDF("g", "v", "isa")
    val r = Ml.mannWhitney(df, "g", "v", "isa").head()
    assert(r.getLong(1) == 2 && r.getLong(2) == 3)
    assert(r.getDouble(3) == 0.0) // U1
    // z = (0 - 3) / sqrt(2*3/12 * 6) = -3/sqrt(3)
    assert(math.abs(r.getDouble(4) - (-3.0 / math.sqrt(3.0))) < 1e-12)
  }

  test("mannWhitney: identical samples give U = n1*n2/2, z = 0 " +
      "(all-tie correction)") {
    import spark.implicits._
    val df = Seq(("g", 7.0, true), ("g", 7.0, true), ("g", 7.0, false),
      ("g", 7.0, false)).toDF("g", "v", "isa")
    val r = Ml.mannWhitney(df, "g", "v", "isa").head()
    assert(r.getDouble(3) == 2.0) // n1*n2/2 with average ranks
    assert(r.getDouble(4) == 0.0) // varU = 0 → z pinned 0
  }

  test("anovaF: two classes reduces to the squared t-test decomposition") {
    import spark.implicits._
    // class a = {1,2,3}, class b = {4,5,6}: SSB = 13.5, SSW = 4
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0),
      ("b", 5.0), ("b", 6.0)).toDF("c", "t")
    val r = Ml.anovaF(df, "c", "t").head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 6)
    assert(math.abs(r.getDouble(2) - 13.5) < 1e-9)
    assert(math.abs(r.getDouble(3) - 4.0) < 1e-9)
    assert(math.abs(r.getDouble(4) - 13.5) < 1e-9) // F = 13.5/(4/4)
  }

  test("bootstrapMeanCI: deterministic replicas, ordered CI bounds") {
    val dir = "/root/testdata/sf0.001"
    val a = Ml.q226BootstrapCI(spark, dir).collect()
    val b = Ml.q226BootstrapCI(spark, dir).collect()
    assert(a.toSeq == b.toSeq) // hash-derived weights: no RNG state
    a.foreach { r =>
      assert(r.getLong(4) == 32)
      assert(r.getDouble(2) < r.getDouble(3)) // ci_lo < ci_hi
      assert(r.getDouble(2) < r.getDouble(1) && // CI brackets the mean
        r.getDouble(1) < r.getDouble(3))
    }
  }

  test("oovRate: tokens outside the top-V vocabulary are counted, " +
      "inside are not") {
    import spark.implicits._
    val docs = Seq((1L, "en", "a a b"), (2L, "en", "a c"),
      (3L, "de", "zz zz zz")).toDF("doc_id", "lang", "text")
    // vocabSize 2 → vocab by df: a (df 2), then tie df=1 broken
    // term-asc: b. So c and zz are OOV.
    val rows = Ml.oovRate(docs, "lang", "text", 2).collect()
    val en = rows.find(_.getString(0) == "en").get
    val de = rows.find(_.getString(0) == "de").get
    assert(en.getLong(2) == 5 && en.getLong(3) == 1) // only "c" OOV
    assert(de.getLong(2) == 3 && de.getLong(3) == 3) // all "zz" OOV
  }

  test("ewmaHourly: single observed bucket = its own mean; dense run " +
      "halves weights") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:30:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 01:30:00")
    val df = Seq(("k", t0, 2.0), ("k", t0, 4.0), ("k", t1, 6.0))
      .toDF("k", "ts", "v")
    val r = Ml.ewmaHourly(df, "ts", "k", "v").collect()
      .map(x => (x.getLong(1), x.getDouble(3))).toMap
    val b0 = r.keys.min
    assert(r(b0) == 3.0) // mean(2,4), no earlier buckets
    // bucket 1: (6*1 + 3*0.5) / 1.5 = 5.0
    assert(r(b0 + 1) == 5.0)
  }

  test("purgedTimeFolds: counts partition the stream and the embargo " +
      "shrinks training sets") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir)
    val total = ev.count()
    val folds = Ml.purgedTimeFolds(ev, "ts", 5, 3600L * 1000000L).collect()
    assert(folds.length == 5)
    assert(folds.map(_.getLong(3)).sum == total) // test sets partition
    assert(folds.head.getLong(4) == 0)           // fold 0 has no past
    // n_train is nondecreasing in fold and below the no-embargo prefix
    val tr = folds.map(_.getLong(4))
    assert(tr.sliding(2).forall(p => p(0) <= p(1)))
    val prefix = folds.scanLeft(0L)(_ + _.getLong(3)).init
    tr.zip(prefix).foreach { case (t, p) => assert(t <= p) }
  }

  test("naiveBayes2: deterministic class on a separable toy table") {
    import spark.implicits._
    // f1 perfectly determines the class; f2 is noise
    val df = Seq(
      ("hot", "x", "summer"), ("hot", "y", "summer"),
      ("hot", "x", "summer"), ("cold", "x", "winter"),
      ("cold", "y", "winter")).toDF("f1", "f2", "c")
    val pred = Ml.naiveBayes2(df, "f1", "f2", "c").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getString(2))).toMap
    assert(pred(("hot", "x")) == "summer")
    assert(pred(("hot", "y")) == "summer")
    assert(pred(("cold", "x")) == "winter")
    assert(pred(("cold", "y")) == "winter")
  }

  test("naiveBayes2: unseen (f, c) pairs get the Laplace floor, not zero") {
    import spark.implicits._
    // f2 = "z" never co-occurs with class b; score must stay positive
    val df = Seq(("p", "z", "a"), ("p", "w", "b"), ("q", "z", "a"),
      ("q", "w", "b")).toDF("f1", "f2", "c")
    val out = Ml.naiveBayes2(df, "f1", "f2", "c").collect()
    assert(out.forall(_.getDouble(3) > 0.0))
  }

  test("stratifiedAte: hand-checked two-stratum effect") {
    import spark.implicits._
    // stratum s1: treated {10}, control {6} → diff 4; n = 2
    // stratum s2: treated {8}, control {2}  → diff 6; n = 2
    // ATE = 0.5*4 + 0.5*6 = 5
    val df = Seq(("s1", true, 10.0), ("s1", false, 6.0),
      ("s2", true, 8.0), ("s2", false, 2.0)).toDF("s", "t", "y")
    val r = Ml.stratifiedAte(df, "s", col("t"), "y").collect()
    assert(r.length == 2)
    assert(r.forall(x => math.abs(x.getDouble(6) - 5.0) < 1e-9))
    val s1 = r.find(_.getString(0) == "s1").get
    assert(s1.getDouble(5) == 4.0)
  }

  test("stratifiedAte: single-arm strata are excluded from the estimate") {
    import spark.implicits._
    val df = Seq(("only_t", true, 9.0), ("both", true, 4.0),
      ("both", false, 2.0)).toDF("s", "t", "y")
    val r = Ml.stratifiedAte(df, "s", col("t"), "y").collect()
    assert(r.length == 1 && r.head.getString(0) == "both")
    assert(r.head.getDouble(6) == 2.0)
  }

  test("gainsCurve: monotone capture, lift ends at 1, counts total") {
    val dir = "/root/testdata/sf0.001"
    val g = Ml.q232GainsCurve(spark, dir).collect()
    assert(g.length == 10)
    val caps = g.map(_.getDouble(4))
    assert(caps.sliding(2).forall(p => p(0) <= p(1) + 1e-15))
    assert(math.abs(caps.last - 1.0) < 1e-12)      // all mass captured
    assert(math.abs(g.last.getDouble(5) - 1.0) < 1e-12) // full-pop lift = 1
    assert(g.map(_.getLong(1)).sum ==
      graft.sources.Tables.orders(spark, dir).count())
  }

  test("int8QuantAudit: exactly-representable vectors reconstruct with " +
      "zero error") {
    import spark.implicits._
    // elements are multiples of max/127 → round-trips exactly
    val v = Array(127.0f, -127.0f, 64.0f, 0.0f)
    val df = Seq((1L, v, 0), (2L, v.map(_ * 0.5f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = Ml.int8QuantAudit(df, "vec_id", "embedding", "label").collect()
    r.foreach { row =>
      assert(row.getDouble(2) == 0.0 && row.getDouble(3) == 0.0)
    }
  }

  test("int8QuantAudit: error bounded by half a quantization step") {
    val dir = "/root/testdata/sf0.001"
    val r = Ml.q233Int8Quant(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getDouble(2) >= 0.0)
      // embeddings are unit-scale floats: step = mx/127 ≤ ~0.1
      assert(row.getDouble(3) < 0.05)
    }
  }

  test("seasonalDecompose: constant series → trend = level, seasonal " +
      "= 1, residual = 1") {
    import spark.implicits._
    // 72 hourly events, exactly one per hour: x ≡ 1 everywhere
    val rows = (0 until 72).map { h =>
      ("k", new java.sql.Timestamp(1700000000000L + h * 3600000L))
    }
    val df = rows.toDF("k", "ts")
    val r = Ml.seasonalDecompose(df, "ts", "k").collect()
    assert(r.length == 72 - 24) // edges without full windows drop
    r.foreach { row =>
      assert(row.getLong(2) == 1L)
      assert(row.getDouble(3) == 1.0)
      assert(row.getDouble(4) == 1.0)
      assert(row.getDouble(5) == 1.0)
    }
  }

  test("ndcgAtK: values in [0,1]; a probe whose whole label cluster is " +
      "retrieved scores 1") {
    import spark.implicits._
    // two tight clusters: probe 0's label-0 twins are its top matches
    def vec(base: Float): Array[Float] =
      Array.tabulate(8)(i => base + i * 0.001f)
    val df = (Seq((0L, vec(1.0f), 0), (1L, vec(1.0f), 0),
      (2L, vec(1.01f), 0)) ++
      (10 to 15).map(i => (i.toLong, vec(-5.0f + i), 1))).toDF(
      "vec_id", "embedding", "label")
    val r = Ml.ndcgAtK(df, "vec_id", "embedding", "label",
      nProbes = 1, k = 10).collect()
    assert(r.length == 1)
    val ndcg = r.head.getDouble(5)
    assert(r.head.getLong(2) == 2)  // both label-0 twins in top-10
    // 1.0 up to the 1e-12 DCG term quantization vs the raw IDCG sum
    assert(math.abs(ndcg - 1.0) < 1e-11)
  }

  test("featureHashingAudit: buckets partition the vocabulary and " +
      "token mass") {
    import spark.implicits._
    val docs = Seq("a b c d", "a a e f g", "h i j").toDF("text")
    val r = Ml.featureHashingAudit(docs, "text", nBuckets = 8).collect()
    assert(r.map(_.getLong(1)).sum == 10) // 10 distinct terms
    assert(r.map(_.getLong(2)).sum == 12) // 12 tokens
    r.foreach { row =>
      assert(row.getLong(0) >= 0 && row.getLong(0) < 8)
      assert(row.getDouble(3) > 0.0 && row.getDouble(3) <= 1.0)
    }
  }

  test("rocAuc: perfect separation = 1, reversed = 0, random ties = 0.5") {
    import spark.implicits._
    val sep = Seq(("g", 1.0, false), ("g", 2.0, false), ("g", 3.0, true),
      ("g", 4.0, true)).toDF("g", "v", "pos")
    assert(Ml.rocAuc(sep, "g", "v", col("pos")).head().getDouble(3) == 1.0)
    val rev = sep.selectExpr("g", "-v AS v", "pos")
    assert(Ml.rocAuc(rev, "g", "v", col("pos")).head().getDouble(3) == 0.0)
    // all scores tied → AUC is exactly 1/2 by the tie convention
    val tied = Seq(("g", 7.0, true), ("g", 7.0, false), ("g", 7.0, true),
      ("g", 7.0, false)).toDF("g", "v", "pos")
    assert(Ml.rocAuc(tied, "g", "v", col("pos")).head().getDouble(3) == 0.5)
  }

  test("classifierReport: a separable table scores prec = recall = " +
      "f1 = 1 on every class") {
    import spark.implicits._
    val df = Seq(("hot", "x", "summer"), ("hot", "y", "summer"),
      ("cold", "x", "winter"), ("cold", "y", "winter"))
      .toDF("f1c", "f2c", "c")
    val r = Ml.classifierReport(df, "f1c", "f2c", "c").collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getDouble(4) == 1.0 && row.getDouble(5) == 1.0 &&
        row.getDouble(6) == 1.0)
      assert(row.getLong(1) == row.getLong(2)) // support == tp
    }
  }

  test("looGroupInfluence: influences are mass-weighted deviations that " +
      "cancel") {
    import spark.implicits._
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 40.0)).toDF("g", "v")
    val r = Ml.looGroupInfluence(df, "g", "v").collect()
    // mean_all = 70/3; without a = 40, without b = 15
    val byG = r.map(x => (x.getString(0), x)).toMap
    assert(math.abs(byG("a").getDouble(3) - 40.0) < 1e-9)
    assert(math.abs(byG("b").getDouble(3) - 15.0) < 1e-9)
    // Σ (N - n_g) * influence_g = 0 exactly (algebraic identity)
    val resid = r.map(x => (3 - x.getLong(1)) * x.getDouble(4)).sum
    assert(math.abs(resid) < 1e-9)
  }

  test("calibrationEce: a perfectly separable table is perfectly " +
      "calibrated at its confidence") {
    import spark.implicits._
    // f1 determines the class deterministically; accuracy = 1 in every
    // bin, so ECE = Σ w_b |1 − conf_b|
    val df = Seq(("hot", "x", "summer"), ("hot", "y", "summer"),
      ("cold", "x", "winter"), ("cold", "y", "winter"))
      .toDF("f1c", "f2c", "c")
    val r = Ml.calibrationEce(df, "f1c", "f2c", "c").collect()
    assert(r.nonEmpty)
    val n = r.map(_.getLong(1)).sum
    assert(n == 4)
    r.foreach { row =>
      assert(row.getDouble(2) == 1.0) // accuracy 1 everywhere
      assert(row.getDouble(3) > 0.5)  // NB is confident on separable data
    }
    val ece = r.head.getDouble(4)
    val expected = r.map(row =>
      row.getLong(1).toDouble / n * math.abs(1.0 - row.getDouble(3))).sum
    assert(math.abs(ece - expected) < 1e-9)
  }

  test("calibrationEce: confidences are normalized posteriors in (0,1]") {
    val dir = "/root/testdata/sf0.001"
    val r = Ml.q240CalibrationEce(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getDouble(3) > 0.0 && row.getDouble(3) <= 1.0)
      assert(row.getDouble(4) >= 0.0 && row.getDouble(4) <= 1.0)
    }
  }

  test("zipfFit: an exact power-law vocabulary recovers its exponent " +
      "with r2 = 1") {
    import spark.implicits._
    // terms t1..t40 where t_r appears round(1000/r) times → slope ≈ −1
    val words = (1 to 40).flatMap(r =>
      Seq.fill(math.max(1, math.round(1000.0 / r).toInt))(s"t$r"))
    val docs = words.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val r = Ml.zipfFit(docs, "text", fitTerms = 40).head()
    assert(r.getLong(0) == 40)
    assert(math.abs(r.getDouble(1) + 1.0) < 0.01) // slope ≈ −1
    assert(r.getDouble(3) > 0.999)                // near-perfect fit
  }

  test("termBurstiness: a term concentrated in one doc out-disperses a " +
      "uniform one") {
    import spark.implicits._
    // "bursty" has counts (6,1,1,1,1); "flat" has (2,2,2,2,2)
    val docs = Seq(
      (1L, "bursty bursty bursty bursty bursty bursty flat flat"),
      (2L, "bursty flat flat"), (3L, "bursty flat flat"),
      (4L, "bursty flat flat"), (5L, "bursty flat flat")).toDF(
      "doc_id", "text")
    val r = Ml.termBurstiness(docs, "doc_id", "text", minDf = 5L, k = 10)
      .collect().map(x => (x.getString(0), x.getDouble(3))).toMap
    assert(r("bursty") > 1.5)
    assert(r("flat") == 0.0) // constant per-doc count: zero dispersion
    assert(r("bursty") > r("flat"))
  }

  test("tableChecksum: order- and partitioning-invariant; any cell edit " +
      "moves the slice checksum") {
    import spark.implicits._
    val base = Seq((1L, "a", 100L), (2L, "b", 200L), (3L, "a", 300L))
    def sum3(rows: Seq[(Long, String, Long)], parts: Int) = {
      val df = rows.toDF("id", "s", "v").repartition(parts)
      Ml.tableChecksum(df, col("s"),
          Seq(col("id"), col("s"), col("v")))
        .collect().map(r => (r.getString(0),
          (r.getLong(1), r.getDecimal(2)))).toMap
    }
    val a = sum3(base, 1)
    assert(sum3(base.reverse, 7) == a) // row order + layout irrelevant
    val edited = sum3(Seq((1L, "a", 100L), (2L, "b", 200L),
      (3L, "a", 301L)), 1)
    assert(edited("b") == a("b"))      // untouched slice agrees
    assert(edited("a") != a("a"))      // edited slice detected
  }

  test("histogramIntersection: identical distributions = 1, disjoint " +
      "supports = 0") {
    import spark.implicits._
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("k", "v")
    val r1 = Ml.histogramIntersection(same, "k", "v", 4).head()
    assert(r1.getDouble(2) == 1.0)
    val disj = (Seq.fill(5)(("a", 1.0)) ++ Seq.fill(5)(("b", 100.0)))
      .toDF("k", "v")
    // disjoint supports → no shared bin → pair row absent or 0
    val rows = Ml.histogramIntersection(disj, "k", "v", 4).collect()
    assert(rows.isEmpty || rows.forall(_.getDouble(2) == 0.0))
  }

  test("conformalInterval: empirical coverage lands near the 1-alpha " +
      "target on the held-out fold") {
    val dir = "/root/testdata/sf0.01"
    val r = Ml.q245ConformalInterval(spark, dir).collect()
    assert(r.length == 5)
    r.foreach { row =>
      assert(row.getDouble(5) > 0.0) // q_hat positive
      // conformal guarantee: coverage ≥ 1−α − slack; and not degenerate 1
      val cov = row.getDouble(6)
      assert(cov > 0.82 && cov <= 1.0, s"coverage $cov out of band")
    }
  }

  test("conformalInterval: coverage test is the exact integer residual " +
      "comparison (hand case)") {
    import spark.implicits._
    // cat X: train {10,20} (keys 0,3) → pred 15; cal {12,30,15} (keys
    // 1,4,7) → residuals {3,15,0}, k = ceil(4*0.9) = 4 > n → clamp to
    // max = 15; test {29,31} (keys 2,5) → covered: |29-15|=14 ≤ 15 yes,
    // |31-15|=16 > 15 no → coverage 0.5
    val df = Seq((0L, 10.0), (3L, 20.0), (1L, 12.0), (4L, 30.0),
      (7L, 15.0), (2L, 29.0), (5L, 31.0)).map { case (k, v) =>
      (k, "X", v)
    }.toDF("k", "cat", "t")
    val r = Ml.conformalInterval(df, "cat", "t", "k", 1, 10).head()
    assert(r.getDouble(4) == 15.0) // pred
    assert(r.getDouble(5) == 15.0) // q_hat clamped to max residual
    assert(r.getDouble(6) == 0.5)  // coverage
  }

  test("hardNegatives: never returns the probe's own label, ranks are " +
      "dense per probe") {
    val dir = "/root/testdata/sf0.001"
    val labels = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val r = Ml.q246HardNegatives(spark, dir).collect()
    assert(r.nonEmpty)
    r.groupBy(_.getLong(0)).foreach { case (pid, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 5L))
      rows.foreach(x => assert(x.getInt(3) != labels(pid)))
    }
  }

  test("theilSen: immune to a single wild hour that would wreck OLS") {
    import spark.implicits._
    // clean slope +1/hour, with one 1000x outlier hour injected
    val base = (0 until 24).map { h =>
      ("k", new java.sql.Timestamp(1700000000000L + h * 3600000L),
        if (h == 10) 100000.0 else h.toDouble)
    }
    val df = base.toDF("k", "ts", "v")
    val r = Ml.theilSen(df, "ts", "k", "v").head()
    // median pairwise slope stays ~1 despite the outlier
    assert(math.abs(r.getDouble(2) - 1.0) < 0.1,
      s"theil-sen moved: ${r.getDouble(2)}")
  }

  test("itemKnn: cosine is exactly co/sqrt(na*nb) on a hand basket set") {
    import spark.implicits._
    // item 1 in baskets {A,B}; item 2 in {A,B,C}; item 3 in {C}
    val df = Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 2L), ("C", 2L),
      ("C", 3L)).toDF("bk", "it")
    val r = Ml.itemKnn(df, "bk", "it", probeMax = 10L, k = 5).collect()
    val m = r.map(x => ((x.getLong(0), x.getLong(2)), x.getDouble(4))).toMap
    assert(m((1L, 2L)) == 2.0 / math.sqrt(2.0 * 3.0))
    assert(m((3L, 2L)) == 1.0 / math.sqrt(1.0 * 3.0))
    assert(!m.contains((1L, 3L))) // never co-occur → no pair row
  }

  test("twoWayAnova: additive balanced design has zero interaction SS; " +
      "decomposition sums to total") {
    import spark.implicits._
    // y = rowEffect + colEffect, fully balanced → SSAB = 0
    val df = (for (a <- Seq(0, 10); b <- Seq(0, 1, 2); r <- 0 to 1)
      yield (s"a$a", s"b$b", (a + b).toDouble)).toDF("a", "b", "t")
    val r = Ml.twoWayAnova(df, "a", "b", "t").head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 3)
    assert(math.abs(r.getDouble(5)) < 1e-9)  // SSAB = 0
    assert(math.abs(r.getDouble(6)) < 1e-9)  // SSW = 0 (exact replicate)
    // SSA = 12·(5²·2)/... check total: Σ(y−ȳ)² = SSA+SSB+SSAB+SSW
    val ys = (for (a <- Seq(0, 10); b <- Seq(0, 1, 2); _ <- 0 to 1)
      yield (a + b).toDouble)
    val mean = ys.sum / ys.size
    val sst = ys.map(y => (y - mean) * (y - mean)).sum
    val parts = r.getDouble(3) + r.getDouble(4) + r.getDouble(5) +
      r.getDouble(6)
    assert(math.abs(parts - sst) < 1e-6)
  }

  test("cuped: adjusted variant means preserve the overall mean and " +
      "rho2 is within [0,1]") {
    val dir = "/root/testdata/sf0.001"
    val r = Ml.q250Cuped(spark, dir).collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getDouble(4) >= 0.0 && row.getDouble(4) <= 1.0)
    }
    // Σ n_v·(ȳ_cv − ȳ_v) = −θ·Σ n_v(x̄_v − x̄) = 0: CUPED is unbiased
    val shift = r.map(x =>
      x.getLong(1) * (x.getDouble(3) - x.getDouble(2))).sum
    val scale = r.map(x => x.getLong(1) * math.abs(x.getDouble(2))).sum
    assert(math.abs(shift) < 1e-6 * math.max(1.0, scale))
  }

  test("powerAnalysis: n scales inverse-quadratically with the MDE") {
    val dir = "/root/testdata/sf0.001"
    val r = Ml.q251PowerAnalysis(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getLong(4)).toMap
    // halving the MDE quadruples the sample (up to ceil rounding)
    assert(math.abs(r(1L).toDouble / r(2L) - 4.0) < 0.01)
    assert(math.abs(r(2L).toDouble / r(10L) - 25.0) < 0.3)
    assert(r(10L) > 0)
  }

  test("quantileTreatmentEffect: a pure location shift shows the same " +
      "QTE at every decile") {
    import spark.implicits._
    val c = (1 to 100).map(i => (false, i.toDouble))
    val t = (1 to 100).map(i => (true, i + 7.0)) // exact +7 shift
    val df = (c ++ t).toDF("t", "y")
    val r = Ml.quantileTreatmentEffect(df, col("t"), "y").collect()
    assert(r.length == 9)
    r.foreach(x => assert(math.abs(x.getDouble(5) - 7.0) < 1e-9))
  }

  test("rakeKeyphrases: multi-word phrase outranks its frequent " +
      "single-word parts (hand case)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "deep learning of the deep learning stack"),
      (2L, "deep learning is the stack")).toDF("doc_id", "text")
    val r = Ml.rakeKeyphrases(docs, "doc_id", "text",
      Seq("the", "of", "is"), maxPhraseLen = 4, k = 10).collect()
    val byPhrase = r.map(x => x.getString(0) ->
      (x.getLong(1), x.getDouble(2))).toMap
    // "deep learning" appears 3x as a phrase; its RAKE score (sum of
    // word degree/freq) must beat the lone "stack"
    assert(byPhrase.contains("deep learning"))
    assert(byPhrase("deep learning")._2 > byPhrase("stack")._2)
    // phrase boundaries respected: no phrase contains a stopword
    r.foreach(x => assert(!x.getString(0).split(" ")
      .exists(Seq("the", "of", "is").contains)))
  }

  test("sourceOverlap: shared content keys count once per pair, " +
      "jaccard exact") {
    import spark.implicits._
    // key "a b" in both src1+src2; "c" only src1; "d d" only src2
    val docs = Seq(("s1", "a b"), ("s1", "b a"), ("s1", "c"),
      ("s2", "a b"), ("s2", "d d")).toDF("source", "text")
    val r = Ml.sourceOverlap(docs, "source", "text").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(2) == 2 && row.getLong(3) == 2) // na, nb
    assert(row.getLong(4) == 1)                        // co ("a b"≡"b a")
    assert(row.getDouble(5) == 1.0 / 3.0)              // 1/(2+2-1)
  }

  test("covariateBalance: identical arm distributions are balanced at " +
      "SMD 0; a unit-σ shift scores SMD 1") {
    import spark.implicits._
    val ctl = (1 to 50).map(i => (false, (i % 10).toDouble))
    val same = (1 to 50).map(i => (true, (i % 10).toDouble))
    val dfSame = (ctl ++ same).toDF("t", "c1")
    val r1 = Ml.covariateBalance(dfSame, col("t"), Seq("c1")).head()
    assert(r1.getDouble(5) == 0.0 && r1.getBoolean(6))
    // shifted by exactly one pooled SD
    val sd = {
      val vs = ctl.map(_._2); val m = vs.sum / vs.size
      math.sqrt(vs.map(v => (v - m) * (v - m)).sum / (vs.size - 1))
    }
    val shifted = (1 to 50).map(i => (true, (i % 10) + sd))
    val r2 = Ml.covariateBalance((ctl ++ shifted).toDF("t", "c1"),
      col("t"), Seq("c1")).head()
    // the irrational shift is centi-quantized by the operator: 1e-3 band
    assert(math.abs(r2.getDouble(5) - 1.0) < 1e-3)
    assert(!r2.getBoolean(6))
  }

  test("priceElasticity: synthetic constant-elasticity demand recovers " +
      "its exponent exactly") {
    import spark.implicits._
    // q = 1000 · price^(−2) over parts priced 1..40 → slope −2, r² = 1
    val rows = (1 to 40).map { p =>
      ("G", p.toLong, p.toDouble, 1000.0 / (p.toDouble * p))
    }
    val df = rows.toDF("l_returnflag", "l_partkey", "price", "qty")
    val r = Ml.priceElasticity(df, "l_returnflag", "price", "qty").head()
    // centi-unit quantization perturbs tiny quantities; stay loose-ish
    assert(math.abs(r.getDouble(2) + 2.0) < 0.05)
    assert(r.getDouble(3) > 0.99)
  }

  test("rollingOls: exact +2/hour synthetic series recovers slope 2 at " +
      "every full window") {
    import spark.implicits._
    val rows = (0 until 48).map { h =>
      ("k", new java.sql.Timestamp(1700000000000L + h * 3600000L),
        h * 2.0)
    }
    val r = Ml.rollingOls(rows.toDF("k", "ts", "v"), "ts", "k", "v", 24)
      .collect()
    assert(r.length == 48 - 2) // nw >= 3 suppresses the first two
    r.foreach(x => assert(x.getDouble(3) == 2.0,
      s"slope ${x.getDouble(3)} at ${x.getLong(1)}"))
  }

  test("qiniCurve: last row's qini equals the full-population uplift " +
      "and the gap closes to zero") {
    val dir = "/root/testdata/sf0.001"
    val r = Ml.q258QiniCurve(spark, dir).collect()
    assert(r.length == 10)
    val last = r.last // bin 0 row = full population
    assert(math.abs(last.getDouble(5) - last.getDouble(6)) < 1e-9)
    assert(math.abs(last.getDouble(7)) < 1e-9)
    // cumulative treated counts monotone down the curve
    val nt = r.map(_.getLong(1))
    assert(nt.sum > 0)
  }

  test("welchTTest: hand-checked two-sample case; equal samples give " +
      "t = 0") {
    import spark.implicits._
    // arm {1, 2, 3} vs rest {2, 4}: m1=2, m2=3, v1=1, v2=2
    // a1 = 1/3, a2 = 1, t = -1/sqrt(4/3), df = (4/3)^2/(1/18 + 1)
    val df = Seq(("g", true, 1.0), ("g", true, 2.0), ("g", true, 3.0),
      ("g", false, 2.0), ("g", false, 4.0)).toDF("g", "a", "v")
    val r = Ml.welchTTest(df, "g", col("a"), "v").head()
    assert(r.getLong(1) == 3 && r.getLong(2) == 2)
    assert(math.abs(r.getDouble(3) - (-1.0)) < 1e-12)
    assert(math.abs(r.getDouble(4) - (-1.0 / math.sqrt(4.0 / 3))) < 1e-12)
    assert(math.abs(r.getDouble(5) -
      (4.0 / 3 * 4 / 3) / (1.0 / 18 + 1.0)) < 1e-12)
    // identical arms: zero mean difference, t exactly 0
    val same = Seq(("g", true, 1.0), ("g", true, 3.0),
      ("g", false, 1.0), ("g", false, 3.0)).toDF("g", "a", "v")
    val s = Ml.welchTTest(same, "g", col("a"), "v").head()
    assert(s.getDouble(3) == 0.0 && s.getDouble(4) == 0.0)
  }

  test("welchTTest: slices missing an arm or with n < 2 are excluded") {
    import spark.implicits._
    val df = Seq(("one_arm", true, 1.0), ("one_arm", true, 2.0),
      ("tiny", true, 1.0), ("tiny", false, 2.0), ("tiny", false, 3.0))
      .toDF("g", "a", "v")
    assert(Ml.welchTTest(df, "g", col("a"), "v").count() == 0)
  }

  test("averagePrecision: hand-checked ranking; perfect ranking = 1") {
    import spark.implicits._
    // score desc → pos at ranks 1 and 3: AP = (1/1 + 2/3)/2 = 5/6
    val df = Seq(("g", 4.0, 1L, true), ("g", 3.0, 2L, false),
      ("g", 2.0, 3L, true), ("g", 1.0, 4L, false))
      .toDF("g", "v", "k", "pos")
    val r = Ml.averagePrecision(df, "g", "v", "k", col("pos")).head()
    assert(r.getLong(1) == 4 && r.getLong(2) == 2)
    assert(math.abs(r.getDouble(3) - 5.0 / 6) < 1e-12)
    // all positives ranked above all negatives → AP = 1
    val perfect = Seq(("g", 4.0, 1L, true), ("g", 3.0, 2L, true),
      ("g", 2.0, 3L, false)).toDF("g", "v", "k", "pos")
    assert(math.abs(Ml.averagePrecision(perfect, "g", "v", "k",
      col("pos")).head().getDouble(3) - 1.0) < 1e-12)
    // score ties broken by the unique key, ascending
    val tied = Seq(("g", 1.0, 2L, true), ("g", 1.0, 1L, false))
      .toDF("g", "v", "k", "pos")
    assert(math.abs(Ml.averagePrecision(tied, "g", "v", "k",
      col("pos")).head().getDouble(3) - 0.5) < 1e-12)
  }

  test("cohensKappa: perfect agreement = 1; marginal-independent " +
      "agreement ≈ 0") {
    import spark.implicits._
    val same = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b")
    assert(math.abs(Ml.cohensKappa(same, "a", "b").head()
      .getAs[Double]("kappa") - 1.0) < 1e-12)
    // 2×2 with agreement exactly at chance: po = pe → κ = 0
    val chance = Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "y"))
      .toDF("a", "b")
    assert(math.abs(Ml.cohensKappa(chance, "a", "b").head()
      .getAs[Double]("kappa")) < 1e-12)
  }

  test("kendallTau: perfect monotone = 1, reversed = -1; tied case " +
      "matches the hand-computed tau-b") {
    import spark.implicits._
    val up = Seq(("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", 3.0, 3.0))
      .toDF("g", "x", "y")
    assert(math.abs(Ml.kendallTau(up, "g", "x", "y").head()
      .getAs[Double]("tau_b") - 1.0) < 1e-12)
    val down = Seq(("g", 1.0, 3.0), ("g", 2.0, 2.0), ("g", 3.0, 1.0))
      .toDF("g", "x", "y")
    assert(math.abs(Ml.kendallTau(down, "g", "x", "y").head()
      .getAs[Double]("tau_b") + 1.0) < 1e-12)
    // x = (1,1,2), y = (1,2,2): only (1,1)-(2,2) is concordant, the
    // other two pairs are x- resp. y-tied -> C=1, D=0, vx = vy = 4,
    // tau_b = 2*1/sqrt(16) = 0.5 (scipy agrees)
    val tied = Seq(("g", 1.0, 1.0), ("g", 1.0, 2.0), ("g", 2.0, 2.0))
      .toDF("g", "x", "y")
    assert(math.abs(Ml.kendallTau(tied, "g", "x", "y").head()
      .getAs[Double]("tau_b") - 0.5) < 1e-12)
    // constant y excluded (vy = 0)
    val const = Seq(("g", 1.0, 5.0), ("g", 2.0, 5.0)).toDF("g", "x", "y")
    assert(Ml.kendallTau(const, "g", "x", "y").count() == 0)
  }

  test("wassersteinDrift: a pure location shift moves W1 by exactly " +
      "the shift") {
    import spark.implicits._
    // key k: first half (ts < mid) values {0, 1}, second half {5, 6}:
    // CDFs are equal shapes shifted by 5 -> W1 = 5
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(h: Int) = new java.sql.Timestamp(
      t0.getTime + h * 3600L * 1000)
    val df = Seq((ts(0), "k", 0.0), (ts(1), "k", 1.0),
      (ts(22), "k", 5.0), (ts(23), "k", 6.0)).toDF("ts", "k", "v")
    val r = Ml.wassersteinDrift(df, "ts", "k", "v").head()
    assert(r.getLong(1) == 2 && r.getLong(2) == 2)
    assert(math.abs(r.getDouble(3) - 5.0) < 1e-12)
    // identical halves -> zero distance
    val same = Seq((ts(0), "k", 1.0), (ts(1), "k", 2.0),
      (ts(22), "k", 1.0), (ts(23), "k", 2.0)).toDF("ts", "k", "v")
    assert(Ml.wassersteinDrift(same, "ts", "k", "v").head()
      .getDouble(3) == 0.0)
  }

  test("logRankTest: hand-computed two-subject case; identical arms " +
      "give z = 0") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(d: Int) = new java.sql.Timestamp(
      t0.getTime + d * 86400L * 1000)
    // arm subject 2 purchases day 1, non-arm subject 1 purchases day 2:
    // t=1: n1=n0=1, d1=1 -> e1 = 0.5, v = 0.25; t=2 has nt=1, skipped
    // => O=1, E=0.5, V=0.25, z = 0.5/0.5 = 1
    val df = Seq((2L, ts(0), "view"), (2L, ts(1), "purchase"),
      (1L, ts(0), "view"), (1L, ts(2), "purchase"))
      .toDF("u", "ts", "et")
    val r = Ml.logRankTest(df, "ts", "u", col("u") % 2 === 0,
      col("et") === "purchase").head()
    assert(r.getLong(0) == 1 && r.getLong(1) == 1)
    assert(r.getLong(2) == 1)
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(4) - 0.25) < 1e-12)
    assert(math.abs(r.getDouble(5) - 1.0) < 1e-12)
    // symmetric arms (mirrored durations, one censored each) -> z = 0
    val sym = Seq((2L, ts(0), "view"), (2L, ts(1), "purchase"),
      (4L, ts(0), "view"), (4L, ts(3), "view"),
      (1L, ts(0), "view"), (1L, ts(1), "purchase"),
      (3L, ts(0), "view"), (3L, ts(3), "view"))
      .toDF("u", "ts", "et")
    val s = Ml.logRankTest(sym, "ts", "u", col("u") % 2 === 0,
      col("et") === "purchase").head()
    assert(s.getDouble(5) == 0.0, s"got $s")
  }

  test("declared ML queries run at sf0.001 with sane shapes") {
    val dir = "/root/testdata/sf0.001"
    val enc = Ml.q221TargetEncoding(spark, dir)
    assert(enc.count() == 25) // 5 priorities × 5 folds
    val sp = Ml.q222SpearmanTrend(spark, dir).collect()
    assert(sp.nonEmpty && sp.forall(r =>
      math.abs(r.getDouble(2)) <= 1.0))
    val mi = Ml.q223MutualInformation(spark, dir).head()
    assert(mi.getAs[Double]("mi_nats") >= 0.0 ||
      math.abs(mi.getAs[Double]("mi_nats")) < 1e-9)
    assert(mi.getAs[Double]("nmi") <= 1.0 + 1e-12)
  }

  test("partialCorrelation: y = x gives partial 1; x = z slices are " +
      "excluded as degenerate") {
    import spark.implicits._
    val same = Seq(("g", 1.0, 1.0, 3.0), ("g", 2.0, 2.0, 1.0),
      ("g", 3.0, 3.0, 4.0), ("g", 4.0, 4.0, 2.0)).toDF("g", "x", "y", "z")
    val r = Ml.partialCorrelation(same, "g", "x", "y", "z").head()
    assert(math.abs(r.getAs[Double]("r_xy_z") - 1.0) < 1e-12)
    // x == z -> r_xz = 1 -> the partial is undefined -> excluded
    val conf = Seq(("g", 1.0, 2.0, 1.0), ("g", 2.0, 1.0, 2.0),
      ("g", 3.0, 4.0, 3.0), ("g", 4.0, 3.0, 4.0)).toDF("g", "x", "y", "z")
    assert(Ml.partialCorrelation(conf, "g", "x", "y", "z").count() == 0)
  }

  test("olsTwoFeatures: exact plane y = 2a + 3b + 5 is recovered with " +
      "r2 = 1") {
    import spark.implicits._
    val rows = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 5.0))
      .map { case (a, b) => ("g", a, b, 2 * a + 3 * b + 5) }
      .toDF("g", "a", "b", "y")
    val r = Ml.olsTwoFeatures(rows, "g", "a", "b", "y").head()
    assert(math.abs(r.getAs[Double]("b1") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b2") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 5.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-12)
    // collinear regressors (b = 2a) are excluded: det = 0
    val col2 = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0))
      .map { case (a, b) => ("g", a, b, a + b) }.toDF("g", "a", "b", "y")
    assert(Ml.olsTwoFeatures(col2, "g", "a", "b", "y").count() == 0)
  }

  test("kruskalWallis: {1,2} vs {3,4} gives the textbook H = 2.4; no " +
      "ties -> correction 1") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val r = Ml.kruskalWallis(df, "g", "v").head()
    // H = 12/(4*5) * (3^2/2 + 7^2/2) - 3*5 = 0.6*29 - 15 = 2.4
    assert(math.abs(r.getAs[Double]("h") - 2.4) < 1e-9)
    assert(math.abs(r.getAs[Double]("tie_c") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("h_adj") - 2.4) < 1e-9)
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("k") == 2L)
  }

  test("decisionStump: a perfectly separable feature splits at gini 0 " +
      "with the exact class counts") {
    import spark.implicits._
    val df = Seq((1.0, false), (1.0, false), (2.0, true), (2.0, true))
      .toDF("x", "pos")
    val r = Ml.decisionStump(df, Seq("x"), col("pos")).head()
    assert(r.getAs[Double]("threshold") == 1.0)
    assert(r.getAs[Double]("weighted_gini") == 0.0)
    assert(r.getAs[Long]("n_left") == 2L && r.getAs[Long]("n_right") == 2L)
    assert(r.getAs[Long]("pos_left") == 0L && r.getAs[Long]("pos_right") == 2L)
  }

  test("randomizationTest: a zero-effect contrast (constant outcome) " +
      "is maximally insignificant, p = 1") {
    import spark.implicits._
    val df = (1 to 40).map(i => ("g", i % 2 == 0, 7.0, i.toLong))
      .toDF("g", "arm", "v", "k")
    val r = Ml.randomizationTest(df, "g", col("arm"), "v", "k", r = 16)
      .head()
    assert(r.getAs[Double]("obs_diff") == 0.0)
    assert(r.getAs[Double]("p_value") == 1.0)
    assert(r.getAs[Long]("n_replicates") <= 16L)
  }

  test("mcnemarNbVsMajority: hand-checked discordant pairs — NB " +
      "perfect, majority wrong on the minority class") {
    import spark.implicits._
    // f1 fully determines the class; majority class is A (3 vs 2).
    // NB predicts both f1 blocks correctly (checked by hand with the
    // +1-smoothed scores), so b = 0, c = 2, chi2 = (0-2)^2/2 = 2.
    val df = Seq(("a", "x", "A"), ("a", "x", "A"), ("a", "x", "A"),
      ("b", "x", "B"), ("b", "x", "B")).toDF("f1", "f2", "c")
    val r = Ml.mcnemarNbVsMajority(df, "f1", "f2", "c").head()
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Long]("b") == 0L && r.getAs[Long]("c") == 2L)
    assert(math.abs(r.getAs[Double]("chi2_mcnemar") - 2.0) < 1e-12)
  }
}
