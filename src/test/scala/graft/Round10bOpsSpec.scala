package graft

import graft.operators.{Graph, Ml, Similarity, Stats}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth toy-fixture tests for the second round-10 operator batch
  * (q402–q409). */
class Round10bOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("pagesTrend: perfectly monotone blocks hit the closed-form L") {
    val df = (for (j <- 1 to 3; (it, v) <- Seq(("a", 1L), ("b", 2L),
      ("c", 3L))) yield (j.toString, it, v)).toDF("j", "it", "v")
    val r = Ml.pagesTrend(df, "j", "it", Seq("a", "b", "c"), col("v"))
      .head()
    assert(r.getAs[Long]("n_judges") == 3L)
    assert(math.abs(r.getAs[Double]("l_stat") - 42.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("e_l") - 36.0) < 1e-12)
    // Var = 3·9·4·8/144 = 6
    assert(math.abs(r.getAs[Double]("z") - 6.0 / math.sqrt(6.0)) < 1e-12)
  }

  test("pagesTrend: incomplete block fails loudly") {
    val df = Seq(("1", "a", 1L), ("1", "b", 2L), ("1", "c", 3L),
      ("2", "a", 1L), ("2", "b", 2L)).toDF("j", "it", "v")
    val ex = intercept[Exception] {
      Ml.pagesTrend(df, "j", "it", Seq("a", "b", "c"), col("v")).collect()
    }
    assert(ex.getMessage.contains("complete") ||
      ex.getCause != null && ex.getCause.getMessage.contains("complete"))
  }

  test("cronbachAlpha: two identical items give alpha = 1") {
    val df = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("v1", "v2")
    val r = Ml.cronbachAlpha(df, Seq("v1", "v2")).head()
    assert(r.getAs[Long]("k") == 2L)
    assert(math.abs(r.getAs[Double]("alpha") - 1.0) < 1e-12)
  }

  test("agreementAudit: identical and constant-shifted measurements") {
    val same = Seq(1.0, 2.0, 3.0).map(v => (v, v)).toDF("x", "y")
    val c = (n: String) => (col(n).cast("decimal(18,2)") * 100)
      .cast("long")
    val r1 = Ml.agreementAudit(same, c("x"), c("y")).head()
    assert(math.abs(r1.getAs[Double]("bias")) < 1e-12)
    assert(math.abs(r1.getAs[Double]("pearson_r") - 1.0) < 1e-12)
    assert(math.abs(r1.getAs[Double]("ccc") - 1.0) < 1e-12)
    val shifted = Seq(1.0, 2.0, 3.0).map(v => (v, v + 1.0)).toDF("x", "y")
    val r2 = Ml.agreementAudit(shifted, c("x"), c("y")).head()
    assert(math.abs(r2.getAs[Double]("bias") - (-1.0)) < 1e-12)
    assert(math.abs(r2.getAs[Double]("loa_low") - (-1.0)) < 1e-12)
    assert(math.abs(r2.getAs[Double]("pearson_r") - 1.0) < 1e-12)
    assert(r2.getAs[Double]("ccc") < 1.0) // shift is punished
  }

  test("coxStuart: strictly increasing series, all pairs up") {
    val df = (1 to 6).map(i => ("g", i, i.toDouble)).toDF("g", "i", "v")
      .select(col("g"), date_add(lit("1992-01-01"), col("i")).as("dt"),
        col("v"))
    val r = Stats.coxStuart(df, "g", "dt", "v").head()
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("n_up") == 3L)
    assert(math.abs(r.getAs[Double]("z") - 3.0 / math.sqrt(3.0)) < 1e-12)
  }

  test("reciprocity: hand directed counts") {
    val e = Seq(("a", "b", 3L), ("b", "a", 1L), ("a", "c", 2L))
      .toDF("s", "d", "n")
    val r = Graph.reciprocity(e, "s", "d", "n").head()
    assert(r.getAs[Long]("n_directed_edges") == 3L)
    assert(r.getAs[Long]("n_reciprocated") == 2L)
    assert(math.abs(r.getAs[Double]("edge_reciprocity") - 2.0 / 3.0)
      < 1e-12)
    assert(r.getAs[Long]("n_transitions") == 6L)
    assert(math.abs(r.getAs[Double]("weighted_reciprocity") - 2.0 / 6.0)
      < 1e-12)
  }

  test("degreePowerLaw: three-degree toy graph vs direct OLS") {
    // path 1-2-3-4-5 plus chord 1-3: degrees 2,2,3,2,1
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L))
      .toDF("a", "b")
    val r = Graph.degreePowerLaw(e, "a", "b").head()
    assert(r.getAs[Long]("n_nodes") == 5L)
    assert(r.getAs[Long]("n_degrees") == 3L)
    assert(r.getAs[Long]("max_degree") == 3L)
    val xs = Seq(math.log(1.0), math.log(2.0), math.log(3.0))
    val ys = Seq(math.log(1.0), math.log(0.8), math.log(0.2))
    val n = 3.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getAs[Double]("ccdf_slope") - slope) < 1e-6)
    assert(math.abs(r.getAs[Double]("alpha") - (1.0 - slope)) < 1e-6)
  }

  test("ansariBradleyDrift: dispersed-vs-tight halves, exact W") {
    // first half A = {1, 5} (extreme ranks), second half B = {3, 3}
    val df = Seq((0L, 1.0), (10L, 5.0), (60L, 3.0), (70L, 3.0))
      .map { case (us, v) => ("k", us, v) }.toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    val r = Ml.ansariBradleyDrift(df, "ts", "k", "v").head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(math.abs(r.getAs[Double]("w_ab") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("e_w") - 3.0) < 1e-12)
    // Var = 2·2·6·2/(48·3) = 1/3
    assert(math.abs(r.getAs[Double]("z") -
      (2.0 - 3.0) / math.sqrt(1.0 / 3.0)) < 1e-9)
  }

  test("brierDecomposition: Murphy identity holds bin-exactly") {
    val df = (1 to 400).map(i =>
      (i.toLong, i % 3, (i % 7) < 3)).toDF("id", "nb", "pos")
    val r = Ml.brierDecomposition(df, "id", col("nb"),
      col("pos")).head()
    val brier = r.getAs[Double]("brier")
    val rel = r.getAs[Double]("reliability")
    val res = r.getAs[Double]("resolution")
    val unc = r.getAs[Double]("uncertainty")
    assert(r.getAs[Long]("n_eval") > 100L)
    assert(math.abs(brier - (rel - res + unc)) < 1e-9)
    assert(res >= 0.0 && rel >= 0.0 && unc > 0.0 && brier > 0.0)
  }

  test("emMixture2: two separated value clumps recover their centers") {
    val df = (Seq.fill(50)(1.0) ++ Seq.fill(50)(9.0)).map(("e", _))
      .toDF("k", "v")
    val rows = Ml.emMixture2(df, "v", rounds = 3).collect()
    assert(rows.length == 3)
    val last = rows.last
    assert(math.abs(last.getAs[Double]("pi1") - 0.5) < 0.1)
    assert(math.abs(last.getAs[Double]("mu1") - 1.0) < 0.5)
    assert(math.abs(last.getAs[Double]("mu2") - 9.0) < 0.5)
    assert(last.getAs[Double]("sigma1") < 2.0)
  }

  test("embeddingDecontamination: exact radius flags the planted pair") {
    val pts = Seq(0L -> 0.0, 1L -> 0.1, 2L -> 1.0, 3L -> 2.0, 4L -> 3.0,
      5L -> 5.0, 6L -> 5.1, 7L -> 7.0, 8L -> 8.0, 9L -> 9.0)
    val df = pts.map { case (i, x) => (i, Array(x, 0.0)) }.toDF("id", "v")
    // tau2 = 2e16 nano-units^2 = radius ~0.141: flags ids 1 and 6 only
    val r = Similarity.embeddingDecontamination(df, "id", "v",
      probeMod = 5L, tau2Nano = 20000000000000000L).head()
    assert(r.getAs[Long]("n_eval") == 2L)
    assert(r.getAs[Long]("n_train") == 8L)
    assert(r.getAs[Long]("n_flagged") == 2L)
    assert(math.abs(r.getAs[Double]("flag_rate") - 0.25) < 1e-12)
  }
}
