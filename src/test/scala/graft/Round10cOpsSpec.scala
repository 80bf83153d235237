package graft

import graft.operators.{Ml, Stats}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth toy-fixture tests for the third round-10 operator batch
  * (q412–q414). */
class Round10cOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("logisticGrowthFit: recovers r and K from a synthetic curve") {
    // discrete logistic: N0 = 100, dN = round(0.5 N (1 - N/1000))
    var n = 100.0
    val cohorts = Seq.newBuilder[(Int, Int)] // (day, newcomers)
    cohorts += ((0, 100))
    for (d <- 1 to 25) {
      val dn = math.round(0.5 * n * (1.0 - n / 1000.0)).toInt
      if (dn > 0) cohorts += ((d, dn))
      n += dn
    }
    val rows = cohorts.result().flatMap { case (d, c) =>
      (1 to c).map(i => (d * 100000 + i, d)) }
    val df = rows.toDF("id", "i")
      .select(col("id"), date_add(lit("1992-01-01"), col("i")).as("dt"))
    val r = Stats.logisticGrowthFit(df, "dt", "id").head()
    // the fit is on 1e-6-scaled variables: r is scale-free, K in entities
    assert(math.abs(r.getAs[Double]("r_growth") - 0.5) < 0.1)
    assert(math.abs(r.getAs[Double]("k_capacity") - 1000.0) < 100.0)
    assert(r.getAs[Double]("r2") > 0.95)
  }

  test("nelsonAalen: four-subject hand trajectory") {
    val day = 86400000000L
    val ev = Seq(
      ("A", 0L, "x"), ("A", day, "purchase"),
      ("B", 0L, "x"), ("B", 2 * day, "x"),
      ("C", 0L, "purchase"),
      ("D", 0L, "x"), ("D", day, "x"))
      .toDF("u", "us", "et")
      .select(col("u"), timestamp_micros(col("us")).as("ts"), col("et"))
    val rows = Ml.nelsonAalen(ev, "ts", "u", col("et") === "purchase")
      .collect()
    assert(rows.length == 2)
    val byT = rows.map(r => r.getAs[Long]("t_days") -> r).toMap
    assert(byT(0L).getAs[Long]("n_risk") == 4L)
    assert(math.abs(byT(0L).getAs[Double]("na_cum_hazard") - 0.25) < 1e-9)
    assert(byT(1L).getAs[Long]("n_risk") == 3L)
    assert(math.abs(byT(1L).getAs[Double]("na_cum_hazard") -
      (0.25 + 1.0 / 3.0)) < 1e-9)
  }

  test("medianCI: 1..9 single group, full-width interval") {
    val df = (1 to 9).map(i => ("g", i.toDouble)).toDF("g", "v")
    val r = Stats.medianCI(df, "g", "v").head()
    assert(r.getAs[Long]("n") == 9L)
    assert(math.abs(r.getAs[Double]("median") - 5.0) < 1e-12)
    // rl = floor((9 − 1.96·3)/2) = 1; rh = ceil((9 + 1.96·3)/2) + 1 = 9
    assert(math.abs(r.getAs[Double]("ci_lo") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("ci_hi") - 9.0) < 1e-12)
  }
}
