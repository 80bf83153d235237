package graft

import graft.operators.{Ml, Stats, TextAnalysis}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth toy-fixture tests for the round-11 operator batch
  * (q415–q419) — independent of the SQL-mirror oracle. */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("vocabCoverage: hand frequency spectrum") {
    // tokens: a×2, b×2, c×1 → N=5, V=3, f1=1, f2=2
    val docs = Seq("a b a", "c b").toDF("text")
    val r = TextAnalysis.vocabCoverage(docs, "text").head()
    assert(r.getAs[Long]("n_tokens") == 5L)
    assert(r.getAs[Long]("n_vocab") == 3L)
    assert(r.getAs[Long]("f1") == 1L)
    assert(r.getAs[Long]("f2") == 2L)
    // bias-corrected Chao1: V + f1(f1-1)/(2(f2+1)) = 3 + 0 = 3
    assert(r.getAs[Double]("chao1") == 3.0)
    assert(math.abs(r.getAs[Double]("gt_unseen_mass") - 0.2) < 1e-15)
    assert(math.abs(r.getAs[Double]("gt_coverage") - 0.8) < 1e-15)
  }

  test("vocabCoverage: all-hapax corpus (f2 = 0) stays defined") {
    val docs = Seq("x y z").toDF("text")
    val r = TextAnalysis.vocabCoverage(docs, "text").head()
    // V=3, f1=3, f2=0 → chao1 = 3 + 3·2/2 = 6; unseen mass = 1
    assert(r.getAs[Double]("chao1") == 6.0)
    assert(r.getAs[Double]("gt_unseen_mass") == 1.0)
    assert(r.getAs[Double]("gt_coverage") == 0.0)
  }

  test("mannKendall: strictly increasing series, textbook S/var/z") {
    val df = Seq.tabulate(4)(i =>
      ("G", java.sql.Date.valueOf(f"1994-01-${i + 1}%02d"),
        (i + 1).toDouble)).toDF("g", "d", "v")
    val r = Stats.mannKendall(df, "g", "d", "v").head()
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Long]("s") == 6L) // all 6 pairs concordant
    // no ties: Var S = 4·3·13/18
    assert(math.abs(r.getAs[Double]("var_s") - 156.0 / 18.0) < 1e-12)
    assert(r.getAs[Double]("tau_b") == 1.0)
    // continuity-corrected z = (6-1)/sqrt(156/18)
    assert(math.abs(r.getAs[Double]("z") -
      5.0 / math.sqrt(156.0 / 18.0)) < 1e-12)
  }

  test("mannKendall: constant series → S=0, var=0, z and tau NULL") {
    val df = Seq.tabulate(4)(i =>
      ("F", java.sql.Date.valueOf(f"1994-01-${i + 1}%02d"), 5.0))
      .toDF("g", "d", "v")
    val r = Stats.mannKendall(df, "g", "d", "v").head()
    assert(r.getAs[Long]("s") == 0L)
    assert(r.getAs[Double]("var_s") == 0.0)
    assert(r.isNullAt(r.fieldIndex("tau_b")))
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("mannKendall: single-day group survives with S=0") {
    val df = Seq(("A", java.sql.Date.valueOf("1994-01-01"), 1.0),
      ("A", java.sql.Date.valueOf("1994-01-01"), 2.0))
      .toDF("g", "d", "v")
    val r = Stats.mannKendall(df, "g", "d", "v").head()
    assert(r.getAs[Long]("n_days") == 1L)
    assert(r.getAs[Long]("s") == 0L)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("conformalQuantile: exact k-th residual order statistic") {
    // v = 1..5 dollars, mean 3.00 → |n·v − S| scores 0,500,500,1000,1000
    val df = (1 to 5).map(i => ("A", i.toDouble)).toDF("g", "v")
    val rows = Stats.conformalQuantile(df, "g", "v", Seq(2, 6))
      .collect().map(r => r.getAs[Double]("alpha") ->
        (r.getAs[Long]("k"), r.getAs[Double]("qhat"))).toMap
    // α=1/6: k = ⌈6·5/6⌉ = 5 → 5th score 1000 → 2.00 dollars
    assert(rows(1.0 / 6.0) == (5L, 2.0))
    // α=1/2: k = ⌈6·1/2⌉ = 3 → 3rd score 500 → 1.00
    assert(rows(0.5) == (3L, 1.0))
  }

  test("conformalQuantile: k > n reports NULL (no finite guarantee)") {
    val df = Seq(("B", 1.0), ("B", 2.0)).toDF("g", "v")
    val r = Stats.conformalQuantile(df, "g", "v", Seq(10)).head()
    assert(r.getAs[Long]("k") == 3L) // ⌈3·9/10⌉ = 3 > n = 2
    assert(r.isNullAt(r.fieldIndex("qhat")))
  }

  test("cuped: perfectly correlated pre-period equalizes the arms") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // user u: pre value = u dollars, post value = u + 1 dollars → θ = 1
    val ev = (1 to 4).flatMap(u => Seq(
      (u.toLong, ts(5), u.toDouble),        // pre  (before Jan 16)
      (u.toLong, ts(20), (u + 1).toDouble)  // post
    )).toDF("user_id", "ts", "value")
    val rows = Ml.cuped(ev, "ts", "user_id", "value",
      (col("user_id") % 2 === 0).cast("int").cast("long"),
      "2024-01-16 00:00:00").collect()
    assert(rows.length == 2)
    val byArm = rows.map(r => r.getAs[Long]("arm") -> r).toMap
    // arm1 = even users (2,4): post = 3,5 → 4.0; arm0 = odd (1,3) → 3.0
    assert(byArm(0L).getAs[Double]("y_mean") == 3.0)
    assert(byArm(1L).getAs[Double]("y_mean") == 4.0)
    rows.foreach { r =>
      assert(r.getAs[Double]("theta") == 1.0)
      assert(r.getAs[Double]("var_reduction") == 1.0)
      // θ=1 removes the pre-period difference entirely: both arms 3.5
      assert(math.abs(r.getAs[Double]("y_cuped_mean") - 3.5) < 1e-12)
    }
  }

  test("cuped: zero pre-period variance → theta NULL, raw means intact") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    val ev = (1 to 4).flatMap(u => Seq(
      (u.toLong, ts(5), 2.0), (u.toLong, ts(20), u.toDouble)))
      .toDF("user_id", "ts", "value")
    val rows = Ml.cuped(ev, "ts", "user_id", "value",
      (col("user_id") % 2 === 0).cast("int").cast("long"),
      "2024-01-16 00:00:00").collect()
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("theta")))
      assert(r.isNullAt(r.fieldIndex("y_cuped_mean")))
      assert(!r.isNullAt(r.fieldIndex("y_mean")))
    }
  }
}
