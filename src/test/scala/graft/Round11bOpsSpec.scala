package graft

import graft.operators.{Graph, Sampling}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth toy-fixture tests for the round-11b operator batch
  * (q422 k-truss, q423 Neyman allocation). */
class Round11bOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("kTruss: K4 survives the 4-truss, the pendant triangle peels") {
    // K4 on {1..4} (every edge in 2 triangles) + triangle {4,5,6}
    // (each of its outside edges in exactly 1 triangle)
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("a", "b")
    val rows = Graph.kTruss(e, "a", "b", k = 4, maxRounds = 3).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("truss_degree"))
      .toMap
    assert(rows == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kTruss: k = 3 keeps every triangle edge, drops bridges") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), // triangle
      (3L, 9L)) // bridge, support 0
      .toDF("a", "b")
    val rows = Graph.kTruss(e, "a", "b", k = 3, maxRounds = 2).collect()
      .map(r => r.getAs[Long]("node")).toSet
    assert(rows == Set(1L, 2L, 3L))
  }

  test("kTruss: triangle-free graph empties, no crash") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b") // a path
    assert(Graph.kTruss(e, "a", "b", k = 3, maxRounds = 2).count() == 0L)
  }

  test("kTruss: cascade needs the later rounds (bounded-round contract)") {
    // K4 + edge (4,5) + triangle {4,5,7}->no: build a chain where peeling
    // edge (4,5) (support 1 via {4,5,6}) lowers (4,6)/(5,6) support later.
    // Wheel-ish: K4 on {1..4}; {4,5,6} triangle; {5,6,7} triangle.
    // k=4: round 1 peels all of {4,5},{4,6},{5,7},{6,7} (support 1) and
    // keeps {5,6} only while it sits in 2 triangles — it does (both
    // {4,5,6} and {5,6,7}), so round 1 keeps it, round 2 peels it.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L), (5L, 7L), (6L, 7L)).toDF("a", "b")
    val r1 = Graph.kTruss(e, "a", "b", k = 4, maxRounds = 1).collect()
      .map(_.getAs[Long]("node")).toSet
    val r2 = Graph.kTruss(e, "a", "b", k = 4, maxRounds = 2).collect()
      .map(_.getAs[Long]("node")).toSet
    assert(r1 == Set(1L, 2L, 3L, 4L, 5L, 6L)) // (5,6) still alive
    assert(r2 == Set(1L, 2L, 3L, 4L))          // cascade complete
  }

  test("neymanAllocation: big+diverse stratum gets the budget") {
    // stratum A: 4 rows sd>0; stratum B: 4 rows constant (sd=0);
    // stratum C: 2 rows, same spread as A but half the size
    val df = (Seq.tabulate(4)(i => ("A", (i + 1) * 10.0)) ++
      Seq.fill(4)(("B", 7.0)) ++
      Seq(("C", 10.0), ("C", 40.0))).toDF("g", "v")
    val rows = Sampling.neymanAllocation(df, "g", "v", budget = 100L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("sd"), r.getAs[Long]("alloc_neyman"),
          r.getAs[Long]("alloc_proportional"))).toMap
    // sd_A = sqrt((4*3000-100^2)/16)/1 dollars... compute exactly:
    // A cents: 1000,2000,3000,4000; N=4, sxx=30e6, sx=10000
    // sd = sqrt(4*30e6 - 1e8)/4/100 = sqrt(2e7)/400 = 11.180339887498949
    assert(math.abs(rows("A")._1 - math.sqrt(2e7) / 400) < 1e-12)
    assert(rows("B")._1 == 0.0)
    // weights: A = 4*11.1803 = 44.72; B = 0; C = 2*15 = 30
    // shares: A 0.5984, C 0.4016 -> allocs 60/40 (after largest remainder)
    assert(rows("B")._2 == 0L) // zero-variance stratum: no samples
    assert(rows("A")._2 + rows("B")._2 + rows("C")._2 == 100L)
    assert(rows("A")._2 > rows("C")._2)
    // proportional ignores sd: 40/40/20
    assert(rows("A")._3 == 40L && rows("B")._3 == 40L && rows("C")._3 == 20L)
  }

  test("neymanAllocation: allocations sum EXACTLY to the budget") {
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 5.0), ("B", 9.0),
      ("C", 3.0), ("C", 11.0)).toDF("g", "v")
    for (b <- Seq(7L, 10L, 33L, 100L)) {
      val rows = Sampling.neymanAllocation(df, "g", "v", b).collect()
      assert(rows.map(_.getAs[Long]("alloc_neyman")).sum == b, s"budget $b")
      assert(rows.map(_.getAs[Long]("alloc_proportional")).sum == b)
    }
  }

  test("neymanAllocation: all-constant population → NULL Neyman, prop intact") {
    val df = Seq(("A", 5.0), ("A", 5.0), ("B", 7.0), ("B", 7.0))
      .toDF("g", "v")
    val rows = Sampling.neymanAllocation(df, "g", "v", 10L).collect()
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("alloc_neyman")))
      assert(r.isNullAt(r.fieldIndex("share_neyman")))
    }
    assert(rows.map(_.getAs[Long]("alloc_proportional")).sum == 10L)
  }
}
