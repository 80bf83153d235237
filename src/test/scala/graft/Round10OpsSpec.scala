package graft

import graft.operators.{Audit, Graph, Ml, Similarity, Stats, TextAnalysis}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth toy-fixture tests for the round-10 operator batch
  * (q388–q401) — independent of the SQL-mirror oracle (which proves
  * Spark≡DuckDB, not that the algebra is the intended statistic). */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("brownForsythe: two hand groups vs textbook median-centered F") {
    // A: 1,2,3,4 dollars (z on 2x-cent grid: 300,100,100,300)
    // B: 10,10,10,50 (z: 0,0,0,8000)
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("A", _)) ++
      Seq(10.0, 10.0, 10.0, 50.0).map(("B", _))).toDF("g", "v")
    val r = Stats.brownForsythe(df, "g", "v").head()
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("n_total") == 8L)
    val a = 800.0 * 800.0 / 4.0 + 8000.0 * 8000.0 / 4.0 // Σ s1²/n
    val b = a - 8800.0 * 8800.0 / 8.0
    val w = (200000.0 + 64000000.0) - a
    assert(math.abs(r.getAs[Double]("f_bf") - (b / 1.0) / (w / 6.0)) < 1e-6)
  }

  test("jonckheereTerpstra: brute-force pair count on a 2-group toy") {
    // a = {1,2}, b = {2,3}: U = 3·1 + 0.5·1 (one tie) = 3.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("g", "v")
    val r = Stats.jonckheereTerpstra(df, "g", Seq("a", "b"), "v").head()
    assert(r.getAs[Long]("n_total") == 4L)
    assert(math.abs(r.getAs[Double]("jt_u") - 3.5) < 1e-12)
    // E = (N² − Σnᵢ²)/4 = (16 − 8)/4 = 2
    assert(math.abs(r.getAs[Double]("e_jt") - 2.0) < 1e-12)
  }

  test("runsTest: perfectly alternating signs maximize runs") {
    // daily values 1,9,1,9,1,9 -> above/below alternate, R = 6
    val df = Seq(1.0, 9.0, 1.0, 9.0, 1.0, 9.0).zipWithIndex.map {
      case (v, i) => ("g", i, v) }.toDF("g", "i", "v")
      .select(col("g"), date_add(lit("1992-01-01"), col("i")).as("dt"),
        col("v"))
    val r = Stats.runsTest(df, "g", "dt", "v").head()
    assert(r.getAs[Long]("n_above") == 3L && r.getAs[Long]("n_below") == 3L)
    assert(r.getAs[Long]("runs") == 6L)
    assert(math.abs(r.getAs[Double]("e_runs") - 4.0) < 1e-12)
    // Var = 2·3·3·(18−6)/(36·5) = 1.2
    assert(math.abs(r.getAs[Double]("z") - 2.0 / math.sqrt(1.2)) < 1e-12)
  }

  test("mantelHaenszel: two hand strata vs the pooled-term formula") {
    def stratum(g: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((g, true, true)) ++ Seq.fill(b)((g, true, false)) ++
        Seq.fill(c)((g, false, true)) ++ Seq.fill(d)((g, false, false))
    val df = (stratum("s1", 10, 5, 5, 10) ++ stratum("s2", 4, 1, 2, 3))
      .toDF("g", "e", "y")
    val r = Ml.mantelHaenszel(df, "g", col("e"), col("y")).head()
    val orExp = (10.0 * 10 / 30 + 4.0 * 3 / 10) /
      (5.0 * 5 / 30 + 1.0 * 2 / 10)
    assert(r.getAs[Long]("n_strata") == 2L)
    assert(r.getAs[Long]("n_total") == 40L)
    assert(math.abs(r.getAs[Double]("or_mh") - orExp) < 1e-9)
    val ome = (10.0 - 15.0 * 15.0 / 30.0) + (4.0 - 5.0 * 6.0 / 10.0)
    val v = 15.0 * 15 / 30 * 15 * 15 / (30.0 * 29) +
      5.0 * 5 / 10 * 6 * 4 / (10.0 * 9)
    assert(math.abs(r.getAs[Double]("chi2_cmh") - ome * ome / v) < 1e-6)
  }

  test("hellingerDrift: hand halves vs direct Bhattacharyya") {
    val df = Seq((0L, 1.0), (10L, 1.0), (20L, 2.0), (60L, 2.0),
        (70L, 2.0))
      .map { case (us, v) => ("k", us, v) }.toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    // mid = 35 us: A = {1,1,2}, B = {2,2}
    val r = Ml.hellingerDrift(df, "ts", "k", "v").head()
    val bc = math.sqrt((1.0 / 3.0) * 1.0) // only v=2 overlaps
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(math.abs(r.getAs[Double]("bhattacharyya") - bc) < 1e-9)
    assert(math.abs(r.getAs[Double]("hellinger") - math.sqrt(1 - bc)) < 1e-9)
  }

  test("fanoFactor: bursty hand counts over the global span") {
    // key X: 3 events in bucket 0, 1 in bucket 3 -> B = 4, mean 1,
    // var = (9+1)/4 − 1 = 1.5, fano = 1.5
    val df = Seq(0L, 1L, 2L, 3L * 3600000000L).map(us => ("x", us))
      .toDF("k", "us")
      .select(col("k"), timestamp_micros(col("us")).as("ts"))
    val r = Stats.fanoFactor(df, "ts", "k", 3600L).head()
    assert(r.getAs[Long]("n_buckets_span") == 4L)
    assert(r.getAs[Long]("n_buckets_active") == 2L)
    assert(math.abs(r.getAs[Double]("fano") - 1.5) < 1e-12)
  }

  test("harmonicCloseness: path graph 1-2-3-4-5 from the two hubs") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val rows = Graph.harmonicCloseness(e, "a", "b", nSources = 2,
      maxDepth = 4).collect()
    assert(rows.length == 2)
    val byNode = rows.map(r => r.getAs[Long]("node") -> r).toMap
    // sources: degree ties at 2 for nodes 2,3,4 -> ids 2 and 3
    assert(byNode.keySet == Set(2L, 3L))
    assert(math.abs(byNode(2L).getAs[Double]("harmonic") -
      (1.0 + 1.0 + 0.5 + 1.0 / 3.0)) < 1e-9)
    assert(math.abs(byNode(3L).getAs[Double]("harmonic") - 3.0) < 1e-9)
    assert(byNode(2L).getAs[Long]("sum_hops") == 7L)
    assert(math.abs(byNode(3L).getAs[Double]("closeness") - 4.0 / 6.0)
      < 1e-12)
  }

  test("richClub: triangle core + two spokes") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (1L, 5L))
      .toDF("a", "b")
    val r = Graph.richClub(e, "a", "b", topM = 2).head()
    // hubs = {1 (deg 4), 2 (deg 2, id tie-break)} -> 1 internal edge
    assert(r.getAs[Long]("e_club") == 1L)
    assert(math.abs(r.getAs[Double]("phi") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("density") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("phi_norm") - 2.0) < 1e-12)
  }

  test("heapsLaw: two-doc corpus fits the exact two-point line") {
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = TextAnalysis.heapsLaw(docs, "doc_id", "text").head()
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(r.getAs[Long]("n_vocab") == 3L)
    val beta = (math.log(3.0) - math.log(2.0)) /
      (math.log(4.0) - math.log(2.0))
    assert(math.abs(r.getAs[Double]("heaps_beta") - beta) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-9)
  }

  test("lexicalDiversity: hand token/bigram counts") {
    val docs = Seq(("en", "a a b"), ("en", "c")).toDF("lang", "text")
    val r = TextAnalysis.lexicalDiversity(docs, "lang", "text").head()
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(r.getAs[Long]("n_types") == 3L)
    assert(math.abs(r.getAs[Double]("ttr") - 0.75) < 1e-12)
    assert(r.getAs[Long]("n_hapax") == 2L)
    assert(r.getAs[Long]("n_bigrams") == 2L) // "a a", "a b"
    assert(r.getAs[Long]("n_bigram_types") == 2L)
    assert(math.abs(r.getAs[Double]("distinct2") - 1.0) < 1e-12)
  }

  test("recordBreaks: hand series vs harmonic baseline") {
    val df = Seq(1.0, 3.0, 2.0, 5.0).zipWithIndex.map { case (v, i) =>
      ("g", i, v) }.toDF("g", "i", "v")
      .select(col("g"), date_add(lit("1992-01-01"), col("i")).as("dt"),
        col("v"))
    val r = Stats.recordBreaks(df, "g", "dt", "v").head()
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Long]("n_records") == 3L) // 1, 3, 5
    val h = 1.0 + 0.5 + 1.0 / 3.0 + 0.25
    assert(math.abs(r.getAs[Double]("expected_records") - h) < 1e-9)
    assert(math.abs(r.getAs[Double]("record_ratio") - 3.0 / h) < 1e-9)
  }

  test("candidateKeys: key vs non-key combos") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "k")
    val rows = Audit.candidateKeys(df, Seq(Seq("id"), Seq("k")))
      .collect().map(r => r.getAs[String]("combo") -> r).toMap
    assert(rows("id").getAs[Long]("n_distinct") == 3L)
    assert(rows("id").getAs[Boolean]("is_key"))
    assert(rows("k").getAs[Long]("n_distinct") == 2L)
    assert(!rows("k").getAs[Boolean]("is_key"))
    assert(math.abs(rows("k").getAs[Double]("uniqueness") - 2.0 / 3.0)
      < 1e-12)
  }

  test("winsorizedMean: one outlier clamps to the 9th order stat") {
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).map(("g", _))
      .toDF("g", "v")
    val r = Stats.winsorizedMean(df, "g", "v", trimDenom = 10).head()
    assert(r.getAs[Long]("clamped_each_side") == 1L)
    assert(math.abs(r.getAs[Double]("lo_clamp") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("hi_clamp") - 9.0) < 1e-12)
    // 1→2 and 100→9: (45 − 1 − 100 + 2 + 9 + 100 − 55)... directly: 55/10
    assert(math.abs(r.getAs[Double]("winsorized_mean") - 5.5) < 1e-12)
  }

  test("hubnessAudit: 1-D line of points, exact neighbor counts") {
    val df = Seq(0.0, 0.1, 0.2, 0.3, 0.9).zipWithIndex.map {
      case (x, i) => (i.toLong, Array(x, 0.0)) }.toDF("id", "v")
    // probes = even ids {0, 2, 4} (probeMod = 1 — every vector a probe,
    // broadcast = corpus — is rejected since r11; see the guard test)
    val rows = Similarity.hubnessAudit(df, "id", "v", probeMod = 2L,
      k = 2, topHubs = 5).collect()
    val counts = rows.map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Long]("n_lists")).toMap
    // probe 0 → {1, 2}; probe 2 → {1, 3} (0.1-tie broken by asc id);
    // probe 4 → {3, 2}
    assert(counts == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // ties in n_lists order by asc vec_id
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L, 3L))
    val meanRank = rows.map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Double]("mean_rank")).toMap
    assert(meanRank(1L) == 1.0 && meanRank(2L) == 2.0 &&
      meanRank(3L) == 1.5)
  }

  test("hubnessAudit: probeMod = 1 (broadcast = whole corpus) rejected") {
    val df = Seq((0L, Array(0.0, 0.0)), (1L, Array(1.0, 0.0)))
      .toDF("id", "v")
    intercept[IllegalArgumentException] {
      Similarity.hubnessAudit(df, "id", "v", probeMod = 1L, k = 1,
        topHubs = 1)
    }
  }

  test("hubnessAudit: panel larger than maxProbes fails loudly") {
    val df = (0L to 9L).map(i => (i, Array(i.toDouble / 10, 0.0)))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Similarity.hubnessAudit(df, "id", "v", probeMod = 2L, k = 1,
        topHubs = 3, maxProbes = 2L)
    }
    assert(e.getMessage.contains("maxProbes"))
  }

  test("hubnessAudit: out-of-grid component fails loudly, not NULLS FIRST") {
    // |x| >= 10 quantizes to NULL on the nano grid; pre-r11 the NULL
    // distance ranked FIRST (Spark ascending sort is NULLS FIRST) and the
    // garbage point topped every neighbor list
    val df = Seq((0L, Array(0.0, 0.0)), (1L, Array(0.1, 0.0)),
      (2L, Array(11.0, 0.0))).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Similarity.hubnessAudit(df, "id", "v", probeMod = 2L, k = 1,
        topHubs = 3)
    }
    assert(e.getMessage.contains("nano-unit"))
  }

  test("embeddingDecontamination: NaN component fails loudly (missed-leak guard)") {
    val df = Seq((0L, Array(0.0, 0.0)), (1L, Array(Double.NaN, 0.0)),
      (2L, Array(0.2, 0.0)), (3L, Array(0.3, 0.0))).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Similarity.embeddingDecontamination(df, "id", "v", probeMod = 2L,
        tau2Nano = 1L)
    }
  }

  test("embeddingDecontamination: panel cap fails loudly") {
    val df = (0L to 9L).map(i => (i, Array(i.toDouble / 10, 0.0)))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Similarity.embeddingDecontamination(df, "id", "v", probeMod = 2L,
        tau2Nano = 1L, maxProbes = 3L)
    }
    assert(e.getMessage.contains("maxProbes"))
  }
}
