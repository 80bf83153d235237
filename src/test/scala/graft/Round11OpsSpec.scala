package graft

import graft.operators.{Stats, TextAnalysis}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth toy-fixture tests for the round-11 operator batch
  * (q415 vocab coverage, q416 Mann–Kendall) — independent of the
  * SQL-mirror oracle. DDSketch (q420/q421) has its own DdSketchSpec. */
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

}
