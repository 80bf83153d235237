package graft

import graft.operators.{Audit, Graph, Ml, Stats, TextAnalysis}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth toy-fixture tests for the round-9 operator batch —
  * independent of the SQL-mirror oracle (which proves Spark≡DuckDB, not
  * that the algebra is the intended statistic). */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("modularity: two bridged triangles under their natural partition") {
    // triangles {1,2,3} and {4,5,6} + bridge 3-4: m = 7, d_A = d_B = 7,
    // m_A = m_B = 3 -> Q_c = 3/7 - (7/14)^2, Q = 2 * Q_c
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("a", "b")
    val comm = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"),
      (6L, "B")).toDF("node", "c")
    val rows = Graph.modularity(edges, "a", "b", comm, "node", "c")
      .collect()
    assert(rows.length == 2)
    val qc = 3.0 / 7.0 - 0.25
    rows.foreach { r =>
      assert(r.getAs[Long]("intra_edges") == 3L)
      assert(r.getAs[Long]("degree_sum") == 7L)
      assert(math.abs(r.getAs[Double]("q_c") - qc) < 1e-12)
      assert(math.abs(r.getAs[Double]("q_total") - 2 * qc) < 1e-12)
    }
  }

  test("densityIslands: gaps split, minPts filters") {
    val vals = Seq(1.00, 1.01, 1.02, 5.00, 5.01, 9.99).toDF("v")
    val out = Stats.densityIslands(vals, "v", epsCents = 2L, minPts = 2L)
      .collect()
    assert(out.map(r => (r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents"),
      r.getAs[Long]("n_points"))).toSeq ==
      Seq((100L, 102L, 3L), (500L, 501L, 2L)))
  }

  test("joinFanoutAudit: exact skew numbers on a known key set") {
    val df = (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(7)("c"))
      .toDF("k")
    val r = Audit.joinFanoutAudit(df, "k", "toy").head()
    assert(r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("max_fanout") == 7L)
    assert(r.getAs[Long]("p50_fanout") == 2L)
    assert(r.getAs[Long]("p99_fanout") == 7L)
    assert(r.getAs[Double]("selfjoin_rows") == 54.0)
    assert(math.abs(r.getAs[Double]("top1_share") - 0.7) < 1e-12)
  }

  test("logisticGd: separable toy data is fit with the right sign") {
    val df = (0 until 200).map { i =>
      val x1 = i % 101
      (if (x1 > 50) 1L else 0L, x1.toLong, (i % 7).toLong)
    }.toDF("y", "x1", "x2")
    val r = Ml.logisticGd(df, "y", "x1", "x2", iters = 12).head()
    assert(r.getAs[Double]("beta1") > 0.0, "slope must point at the label")
    assert(r.getAs[Double]("accuracy") > 0.9,
      s"separable fit should classify well: ${r.getAs[Double]("accuracy")}")
  }

  test("kmeans2d: four separated blobs are recovered exactly") {
    val pts = for {
      (bx, by) <- Seq((0L, 0L), (0L, 100L), (100L, 0L), (100L, 100L))
      i <- 0 until 25
    } yield (bx + i % 5, by + (i / 5) % 5)
    val out = Ml.kmeans2d(pts.toDF("x1", "x2"), "x1", "x2", k = 4,
      iters = 3).collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Long]("n_points") == 25L),
      out.map(_.getAs[Long]("n_points")).mkString(","))
  }

  test("holtWinters: a constant series is a fixed point") {
    val df = (0 until 20).map(i =>
      ("k", java.sql.Date.valueOf(java.time.LocalDate.of(1992, 1, 1)
        .plusDays(i.toLong)), 7.00)).toDF("k", "d", "v")
    val out = Stats.holtWinters(df, "k", "d", "v").collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getAs[Long]("level_c") == 700L)
      assert(r.getAs[Long]("trend_c") == 0L)
      assert(r.getAs[Long]("seasonal_c") == 0L)
    }
  }

  test("quantileNormalize: identical slice marginals map to identity") {
    val df = (1 to 10).flatMap(v => Seq(("s1", v.toLong), ("s2", v.toLong)))
      .toDF("s", "v")
    val out = Ml.quantileNormalize(df, "s", "v").collect()
    assert(out.length == 20)
    out.foreach(r =>
      assert(r.getAs[Long]("normalized") == r.getAs[Long]("v")))
  }

  test("conformalIntervals: coverage honors the finite-sample bound") {
    // value depends on i/2 so the even/odd calibration split is
    // exchangeable (i % 10 would correlate parity with the value)
    val df = (0 until 400).map(i =>
      ("t", i.toLong, (i / 2 % 10).toDouble)).toDF("t", "id", "v")
    val r = Ml.conformalIntervals(df, "t", "id", "v").head()
    // exchangeable splits: coverage >= 1 - alpha - slack
    assert(r.getAs[Double]("coverage") >= 0.85,
      s"coverage ${r.getAs[Double]("coverage")}")
    assert(r.getAs[Long]("qhat_c") >= 0L)
  }

  test("fairnessAudit: exact confusion cells per group") {
    val df = Seq(
      ("A", true, true), ("A", false, false),
      ("B", true, false), ("B", false, true)).toDF("g", "y", "p")
    val rows = Ml.fairnessAudit(df, "g", col("y"), col("p"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(rows("A").getAs[Double]("tpr") == 1.0)
    assert(rows("A").getAs[Double]("fpr") == 0.0)
    assert(rows("B").getAs[Double]("tpr") == 0.0)
    assert(rows("B").getAs[Double]("fpr") == 1.0)
    assert(rows("A").getAs[Double]("selection_rate") == 0.5)
    assert(math.abs(rows("A").getAs[Double]("disparate_impact") - 1.0)
      < 1e-12)
  }

  test("betweennessSampled: exact Brandes dependencies on the 5-path") {
    // path 1-2-3-4-5, all 5 nodes as sources: per-pair dependencies
    // sum to [0, 6, 8, 6, 0]; every node is reached by the other 4
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val out = Graph.betweennessSampled(edges, "a", "b", nSources = 5,
        maxDepth = 4)
      .collect().map(r => r.getAs[Long]("node") ->
        (r.getAs[Double]("betweenness"), r.getAs[Long]("n_sources"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    val want = Map(1L -> 0.0, 2L -> 6.0, 3L -> 8.0, 4L -> 6.0, 5L -> 0.0)
    want.foreach { case (n, b) =>
      assert(math.abs(out(n)._1 - b) < 1e-9, s"node $n: ${out(n)._1}")
      assert(out(n)._2 == 4L, s"node $n n_sources: ${out(n)._2}")
    }
  }

  test("cusumDrift: a clean step after the baseline alarms immediately") {
    // 28 baseline days at 10.00 -> mu0 = 1000c, k = 50c, h = 250c;
    // then 12 days at 20.00: S+ climbs 950c/day, alarms from day one
    val df = (0 until 40).map { i =>
      ("k", java.sql.Date.valueOf(java.time.LocalDate
        .of(1992, 1, 1).plusDays(i)), if (i < 28) 10.00 else 20.00)
    }.toDF("k", "dt", "v")
    val rows = Stats.cusumDrift(df, "k", "dt", "v").collect()
    assert(rows.length == 13) // anchor (day 28 of span) + 12 monitored
    val first = rows.head
    assert(first.getAs[Long]("mu0_c") == 1000L)
    assert(first.getAs[Long]("k_c") == 50L)
    assert(first.getAs[Long]("h_c") == 250L)
    assert(first.getAs[Long]("sp_c") == 0L &&
      first.getAs[Long]("sn_c") == 0L) // baseline anchor
    rows.tail.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("sp_c") == 950L * (i + 1))
      assert(r.getAs[Long]("sn_c") == 0L)
      assert(r.getAs[Long]("alarm_up") == 1L)
      assert(r.getAs[Long]("alarm_dn") == 0L)
    }
  }

  test("boostedStumps: exact 3-round fit of a two-level target") {
    // y = 1000c at x=1.00, 2000c at x=2.00; F0 = 1500, each round
    // halves the residual via nu = 1/2 floor leaves
    val df = Seq((1.00, 10.00), (1.00, 10.00), (2.00, 20.00),
      (2.00, 20.00)).toDF("x", "y")
    val rows = Ml.boostedStumps(df, Seq("x"), "y", rounds = 3).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[String]("feature") == "x"))
    assert(rows.forall(_.getAs[Double]("threshold") == 1.0))
    assert(rows.map(_.getAs[Long]("leaf_left_c")).toSeq ==
      Seq(-250L, -125L, -63L))
    assert(rows.map(_.getAs[Long]("leaf_right_c")).toSeq ==
      Seq(250L, 125L, 62L))
    assert(rows.map(_.getAs[Double]("sse_after")).toSeq ==
      Seq(250000.0, 62500.0, 15626.0))
  }

  test("alsFactors: a rank-1 ratings matrix is reconstructed") {
    // r(u,i) = a_u * b_i is exactly rank 1 — two ALS rounds at rank 2
    // must drive every prediction u·v close to the observed rating
    val ratings = for {
      (u, a) <- Seq((1L, 1L), (2L, 2L), (3L, 3L))
      (i, b) <- Seq((10L, 2L), (20L, 4L))
    } yield (u, i, a * b)
    val out = Ml.alsFactors(ratings.toDF("u", "i", "r"), "u", "i", "r",
        rounds = 2, topN = 5)
      .collect()
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("id")) ->
        (r.getAs[Double]("f1"), r.getAs[Double]("f2"))).toMap
    assert(out.size == 5) // 3 users + 2 items
    for {
      (u, a) <- Seq((1L, 1L), (2L, 2L), (3L, 3L))
      (i, b) <- Seq((10L, 2L), (20L, 4L))
    } {
      val (u1, u2) = out(("user", u))
      val (v1, v2) = out(("item", i))
      val pred = u1 * v1 + u2 * v2
      assert(math.abs(pred - a * b) < 0.75,
        s"pred($u,$i) = $pred, want ${a * b}")
    }
  }

  test("bpeTrain: exact greedy merges on a two-doc corpus") {
    // "abab","aba": round 1 pair (a,b) count 3 -> both docs fuse every
    // non-overlapping occurrence; round 2 ties (ab,ab) vs (ab,a) at 1,
    // pair-asc tie-break picks (ab,a)
    val docs = Seq("abab", "aba").toDF("text")
    val rows = TextAnalysis.bpeTrain(docs, "text", merges = 2,
        clipChars = 64)
      .collect().map(r => (r.getAs[Long]("round"),
        r.getAs[String]("left_tok"), r.getAs[String]("right_tok"),
        r.getAs[String]("merged_tok"), r.getAs[Long]("pair_count")))
    assert(rows.toSeq == Seq((1L, "a", "b", "ab", 3L),
      (2L, "ab", "a", "aba", 1L)))
  }
}
