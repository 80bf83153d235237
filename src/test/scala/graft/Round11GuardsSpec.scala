package graft

import graft.operators.{Graph, Ml, Stats}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input audit for the round-10 operator batch (VERDICT r10
  * item 5): each op either guards loudly or has a DOCUMENTED, TESTED
  * degenerate behavior — never silent garbage. These pin the documented
  * behavior so a refactor that changes it fails a spec, not a user. */
class Round11GuardsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("richClub: topM > node-count uses the ACTUAL club size in phi") {
    // triangle: 3 nodes, 3 edges, club(topM=30) = all 3 nodes
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val r = Graph.richClub(e, "a", "b", topM = 30).head()
    assert(r.getAs[Long]("club_size") == 3L) // min(30, 3), NOT 30
    assert(r.getAs[Long]("e_club") == 3L)
    // phi over the REAL 3-node club: 2·3/(3·2) = 1.0 — the requested-m
    // denominator would report 2·3/(30·29) ≈ 0.0069, silently deflated
    assert(math.abs(r.getAs[Double]("phi") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("density") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("phi_norm") - 1.0) < 1e-12)
  }

  test("richClub: single-edge graph (club of 2) stays defined") {
    val e = Seq((7L, 9L)).toDF("a", "b")
    val r = Graph.richClub(e, "a", "b", topM = 5).head()
    assert(r.getAs[Long]("club_size") == 2L)
    assert(math.abs(r.getAs[Double]("phi") - 1.0) < 1e-12)
  }

  test("richClub: all-self-loop edges yield zeros + NULLs, no crash") {
    val e = Seq((1L, 1L), (2L, 2L)).toDF("a", "b")
    val r = Graph.richClub(e, "a", "b", topM = 5).head()
    assert(r.getAs[Long]("n_nodes") == 0L)
    assert(r.getAs[Long]("club_size") == 0L)
    assert(r.isNullAt(r.fieldIndex("phi")))      // club < 2 → undefined
    assert(r.isNullAt(r.fieldIndex("density")))  // graph < 2 → undefined
  }

  test("jonckheereTerpstra: one populated group → z NULL, never 0/0") {
    // ordering names two groups but the data only has one: every
    // pairwise U is empty, var_jt = 0 → z must be NULL (guarded), with
    // the exact n_total/e_jt still reported
    val df = Seq.tabulate(6)(i => ("A", (i + 1).toDouble)).toDF("g", "v")
    val r = Stats.jonckheereTerpstra(df, "g", Seq("A", "B"), "v").head()
    assert(r.getAs[Long]("n_total") == 6L)
    assert(r.getAs[Double]("jt_u") == 0.0)
    assert(r.getAs[Double]("e_jt") == 0.0)
    assert(r.getAs[Double]("var_jt") == 0.0)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("jonckheereTerpstra: groups with zero rows behave as absent") {
    // 'C' is in the ordering but has no data — statistic must equal the
    // two-group result, not drag NULL/zero group moments through var
    val df = (Seq(1.0, 2.0).map(("A", _)) ++ Seq(3.0, 4.0).map(("B", _)))
      .toDF("g", "v")
    val with3 = Stats.jonckheereTerpstra(df, "g", Seq("A", "B", "C"), "v")
      .head()
    val with2 = Stats.jonckheereTerpstra(df, "g", Seq("A", "B"), "v")
      .head()
    assert(with3.getAs[Double]("jt_u") == with2.getAs[Double]("jt_u"))
    assert(with3.getAs[Double]("e_jt") == with2.getAs[Double]("e_jt"))
    assert(with3.getAs[Double]("var_jt") == with2.getAs[Double]("var_jt"))
  }

  test("runsTest: a group whose days all equal the median is dropped") {
    // constant series → every day ties the median → Wald–Wolfowitz
    // drops all days → no n1/n0 → the group is excluded, not a 0/0 row
    val flat = Seq.tabulate(6)(i =>
      ("FLAT", java.sql.Date.valueOf(f"1994-01-${i + 1}%02d"), 5.0))
    val mixed = Seq.tabulate(6)(i =>
      ("MIX", java.sql.Date.valueOf(f"1994-01-${i + 1}%02d"),
        if (i % 2 == 0) 1.0 else 9.0))
    val df = (flat ++ mixed).toDF("g", "d", "v")
    val rows = Stats.runsTest(df, "g", "d", "v").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("MIX"))
    // MIX alternates perfectly: 6 runs of 3-above/3-below
    assert(rows.head.getAs[Long]("runs") == 6L)
  }

  test("nelsonAalen: zero death events → empty trajectory, no div-zero") {
    val ev = Seq.tabulate(4)(i =>
      ((i % 2).toLong, java.sql.Timestamp.valueOf(s"2024-01-0${i + 1} 00:00:00"),
        "view")).toDF("u", "ts", "et")
    val out = Ml.nelsonAalen(ev, "ts", "u", col("et") === "purchase")
    assert(out.count() == 0L)
  }

  test("nelsonAalen: n_at_risk >= deaths at every emitted time") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", "view"), (1L, "2024-01-02 00:00:00", "purchase"),
      (2L, "2024-01-01 00:00:00", "view"), (2L, "2024-01-05 00:00:00", "view"),
      (3L, "2024-01-01 00:00:00", "purchase"))
      .map { case (u, t, e) => (u, java.sql.Timestamp.valueOf(t), e) }
      .toDF("u", "ts", "et")
    val rows = Ml.nelsonAalen(ev, "ts", "u", col("et") === "purchase")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_risk") >= r.getAs[Long]("n_deaths"))
      assert(r.getAs[Double]("na_cum_hazard") > 0.0)
    }
  }
}
