package graft

import graft.operators.{Stats, TextAnalysis}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth toy-fixture tests for the round-11c operator batch
  * (q424 rank-biased overlap, q425 Theil decomposition, q426 Burrows'
  * Delta). */
class Round11cOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def ranked(items: Seq[Long]) =
    items.zipWithIndex.map { case (i, r) => (i, r + 1L) }.toDF("item", "rnk")

  test("rankBiasedOverlap: identical rankings score rbo_ext = 1") {
    val a = ranked(Seq(10L, 20L, 30L, 40L))
    val r = Stats.rankBiasedOverlap(a, ranked(Seq(10L, 20L, 30L, 40L)), 4)
      .collect().head
    assert(r.getAs[Long]("n_common") == 4L)
    assert(r.getAs[Double]("jaccard_topk") == 1.0)
    // sum_{d=1..4} 2^-d = 1 - 2^-4
    assert(math.abs(r.getAs[Double]("rbo_min") - (1.0 - math.pow(2, -4)))
      < 1e-15)
    assert(math.abs(r.getAs[Double]("rbo_ext") - 1.0) < 1e-15)
  }

  test("rankBiasedOverlap: disjoint rankings score 0") {
    val r = Stats.rankBiasedOverlap(ranked(Seq(1L, 2L)),
      ranked(Seq(8L, 9L)), 2).collect().head
    assert(r.getAs[Long]("n_common") == 0L)
    assert(r.getAs[Double]("jaccard_topk") == 0.0)
    assert(r.getAs[Double]("rbo_min") == 0.0)
    assert(r.getAs[Double]("rbo_ext") == 0.0)
  }

  test("rankBiasedOverlap: swapped pair weights the head (hand case)") {
    // S=[x,y], T=[y,x]: A_1 = 0 (no item has both ranks <= 1), A_2 = 1.
    // rbo_min = 0/2 + 1/4 = 0.25; rbo_ext = 0.25 + (2/2)/4 = 0.5.
    val r = Stats.rankBiasedOverlap(ranked(Seq(1L, 2L)),
      ranked(Seq(2L, 1L)), 2).collect().head
    assert(r.getAs[Long]("n_common") == 2L)
    assert(r.getAs[Double]("jaccard_topk") == 1.0)
    assert(math.abs(r.getAs[Double]("rbo_min") - 0.25) < 1e-15)
    assert(math.abs(r.getAs[Double]("rbo_ext") - 0.5) < 1e-15)
  }

  test("theilDecomposition: equal values inside groups zero the within") {
    // g1 = {100, 100}, g2 = {200, 200}: T_g = 0 both; only between
    // inequality remains: s_1 = 1/3 with mean ratio 2/3, s_2 = 2/3
    // with mean ratio 4/3.
    val df = Seq(("g1", 100L), ("g1", 100L), ("g2", 200L), ("g2", 200L))
      .toDF("seg", "cents")
    val rows = Stats.theilDecomposition(df, "seg", "cents").collect()
      .map(r => r.getAs[String]("seg") -> r).toMap
    assert(rows("g1").getAs[Double]("theil_within") == 0.0)
    assert(rows("g2").getAs[Double]("theil_within") == 0.0)
    assert(math.abs(rows("g1").getAs[Double]("share") - 1.0 / 3) < 1e-12)
    assert(math.abs(rows("g1").getAs[Double]("between_term") -
      (1.0 / 3) * math.log(2.0 / 3)) < 1e-12)
    assert(math.abs(rows("g2").getAs[Double]("between_term") -
      (2.0 / 3) * math.log(4.0 / 3)) < 1e-12)
  }

  test("theilDecomposition: decomposition terms sum to total Theil") {
    val xs = Seq(("a", 100L), ("a", 300L), ("a", 50L),
      ("b", 700L), ("b", 20L), ("c", 500L), ("c", 500L))
    val rows = Stats.theilDecomposition(xs.toDF("seg", "cents"),
      "seg", "cents").collect()
    val decomposed = rows.map(r => r.getAs[Double]("within_contrib") +
      r.getAs[Double]("between_term")).sum
    // direct T = (1/N) sum (x/mu) ln(x/mu)
    val vals = xs.map(_._2.toDouble)
    val mu = vals.sum / vals.size
    val direct = vals.map(x => (x / mu) * math.log(x / mu)).sum / vals.size
    assert(math.abs(decomposed - direct) < 1e-9)
  }

  test("burrowsDelta: antisymmetric slices, sigma-0 terms excluded") {
    // A = "x x y z", B = "x y y z": x and y vary — with two slices every
    // varying term z-scores to ±1, so |z_a - z_b| = 2 — while z is
    // constant across slices (sigma = 0) and must not count.
    val docs = Seq(("A", "x x y z"), ("B", "x y y z"))
      .toDF("source", "text")
    val r = TextAnalysis.burrowsDelta(docs, "source", "text", topM = 3)
      .collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("slice_a") == "A")
    assert(r.head.getAs[Long]("n_terms_used") == 2L)
    assert(math.abs(r.head.getAs[Double]("delta") - 2.0) < 1e-9)
  }

  test("fleissKappa: hand-computed two-rater cases") {
    // i1 = (A,A), i2 = (A,B): P_bar = (1 + 0)/2; marginals A=3, B=1 of 4
    // -> P_e = (9 + 1)/16 = 0.625; kappa = (0.5 - 0.625)/0.375 = -1/3
    val labels = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "B"))
      .toDF("item", "label")
    val r = Stats.fleissKappa(labels, "item", "label", 2).collect().head
    assert(r.getAs[Long]("n_items") == 2L)
    assert(r.getAs[Long]("raters_per_item_min") == 2L)
    assert(math.abs(r.getAs[Double]("p_bar") - 0.5) < 1e-15)
    assert(math.abs(r.getAs[Double]("p_e") - 0.625) < 1e-15)
    assert(math.abs(r.getAs[Double]("kappa") - (-1.0 / 3)) < 1e-12)
    // perfect agreement -> kappa = 1 regardless of chance level
    val perfect = Seq((1L, "A"), (1L, "A"), (2L, "B"), (2L, "B"))
      .toDF("item", "label")
    val k1 = Stats.fleissKappa(perfect, "item", "label", 2).collect().head
    assert(math.abs(k1.getAs[Double]("kappa") - 1.0) < 1e-15)
  }

  test("medianOfMeans: one poisoned block cannot move the median") {
    import org.apache.spark.sql.functions.col
    // ids 0..7, 4 blocks by id % 4; id 0 carries a 1e6 outlier: its
    // block mean explodes, the other three stay at 10 -> MoM = 10
    val df = (0L to 7L).map(i => ("g", i, if (i == 0L) 1000000L else 10L))
      .toDF("grp", "id", "cents")
    val r = Stats.medianOfMeans(df, "grp", col("id"), col("cents"), 4)
      .collect().head
    assert(r.getAs[Long]("n_blocks") == 4L)
    assert(r.getAs[Long]("n_rows") == 8L)
    assert(math.abs(r.getAs[Double]("mom_cents") - 10.0) < 1e-12)
    assert(r.getAs[Double]("mean_cents") > 100000.0)
  }

  test("knBigramCrossEntropy: hand-computed smoothing and backoffs") {
    // train (ids 1,2): "a b a b" twice -> c(a,b)=4, c(b,a)=2;
    // prefix a: cv=4,n1v=1; b: cv=2,n1v=1; cont: n1w(a)=1, n1w(b)=1;
    // n_types=2. held (id 0): "a b" -> P = (4-.75)/4 + (.75/4)*(1/2)
    // = 0.90625. held (id 5): "a c" -> prefix a seen, c never a
    // continuation -> P = 0 + (.75/4)*(1/3) = 0.0625.
    val docs = Seq((1L, "s", "a b a b"), (2L, "s", "a b a b"),
      (0L, "s", "a b"), (5L, "t2", "zz")).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.knBigramCrossEntropy(docs, "lang", "doc_id",
      "text", 5).collect().map(x => x.getAs[String]("lang") -> x).toMap
    val s = r("s")
    assert(s.getAs[Long]("n_heldout_bigrams") == 1L)
    assert(s.getAs[Long]("n_unseen_prefix") == 0L)
    assert(math.abs(s.getAs[Double]("cross_entropy_nats") -
      -math.log(0.90625)) < 1e-9)
    assert(!r.contains("t2")) // one-token doc contributes no bigrams

    val docs2 = Seq((1L, "s", "a b a b"), (2L, "s", "a b a b"),
      (5L, "s", "a c")).toDF("doc_id", "lang", "text")
    val s2 = TextAnalysis.knBigramCrossEntropy(docs2, "lang", "doc_id",
      "text", 5).collect().head
    assert(s2.getAs[Long]("n_unseen_cont") == 1L)
    assert(math.abs(s2.getAs[Double]("cross_entropy_nats") -
      -math.log(0.0625)) < 1e-9)
  }

  test("blockJackknifeRatio: hand case and zero-variance identity") {
    import org.apache.spark.sql.functions.col
    // blocks by id%2: b0 = {y=1,x=2}, b1 = {y=3,x=2}: R = 1,
    // leave-one-out replicates 1.5 and 0.5 -> jackknife se = 0.5
    val df = Seq(("g", 0L, 1L, 2L), ("g", 1L, 3L, 2L))
      .toDF("grp", "id", "y", "x")
    val r = Stats.blockJackknifeRatio(df, "grp", col("id"), col("y"),
      col("x"), 2).collect().head
    assert(math.abs(r.getAs[Double]("ratio") - 1.0) < 1e-15)
    assert(math.abs(r.getAs[Double]("jk_se") - 0.5) < 1e-9)
    // y = 2x everywhere -> every replicate identical -> se exactly 0
    val const = (0L to 9L).map(i => ("g", i, 2 * (i + 1), i + 1))
      .toDF("grp", "id", "y", "x")
    val c = Stats.blockJackknifeRatio(const, "grp", col("id"), col("y"),
      col("x"), 5).collect().head
    assert(c.getAs[Double]("ratio") == 2.0)
    assert(c.getAs[Double]("jk_se") == 0.0)
  }

  test("pettittTest: level shift found, ties averaged, p clamps at 1") {
    // step [1,1,1,5,5,5]: K = |U_3| = 9 at t = 3, means 1 vs 5,
    // p = 2*exp(-6*81/(216+36))
    val step = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 5L), (5L, 5L),
      (6L, 5L)).map { case (t, x) => ("k", t, x) }.toDF("key", "t", "x")
    val r = Stats.pettittTest(step, "key", "t", "x").collect().head
    assert(r.getAs[Long]("k_stat") == 9L)
    assert(r.getAs[Long]("changepoint_t") == 3L)
    assert(r.getAs[Double]("mean_before") == 1.0)
    assert(r.getAs[Double]("mean_after") == 5.0)
    assert(math.abs(r.getAs[Double]("p_approx") -
      2.0 * math.exp(-486.0 / 252.0)) < 1e-12)
    // alternating series: no change point -> small K, p clamps to 1,
    // earliest argmax tie-break
    val alt = Seq((1L, 1L), (2L, 5L), (3L, 1L), (4L, 5L), (5L, 1L),
      (6L, 5L)).map { case (t, x) => ("k", t, x) }.toDF("key", "t", "x")
    val a = Stats.pettittTest(alt, "key", "t", "x").collect().head
    assert(a.getAs[Long]("k_stat") == 3L)
    assert(a.getAs[Long]("changepoint_t") == 1L)
    assert(a.getAs[Double]("p_approx") == 1.0)
  }

  test("stuartMaxwell: hand case and perfect-agreement degeneracy") {
    // cells (0,1)x3 (1,0)x1 (0,2)x1 (2,1)x1 (2,2)x2: d = (3,-3,0),
    // A = 1*9 + 1*9 + 4*0 = 18, B = 4+4+1 = 9 -> chi2 = 2, p = e^-1
    val pairs = Seq((0L, 1L), (0L, 1L), (0L, 1L), (1L, 0L), (0L, 2L),
      (2L, 1L), (2L, 2L), (2L, 2L)).toDF("a", "b")
    val r = Stats.stuartMaxwell(pairs, "a", "b").collect().head
    assert(r.getAs[Long]("d1") == 3L && r.getAs[Long]("d2") == -3L)
    assert(math.abs(r.getAs[Double]("chi2") - 2.0) < 1e-15)
    assert(math.abs(r.getAs[Double]("p_value") - math.exp(-1.0)) < 1e-15)
    // perfect agreement: every off-diagonal 0 -> 0/0 -> NULL chi2
    val agree = Seq((0L, 0L), (1L, 1L), (2L, 2L)).toDF("a", "b")
    val g = Stats.stuartMaxwell(agree, "a", "b").collect().head
    assert(g.isNullAt(g.fieldIndex("chi2")))
    assert(g.isNullAt(g.fieldIndex("p_value")))
  }

  test("turningPointTest: counts strict extrema only") {
    // [1,3,2,4,1,5]: every interior point is a strict extremum -> T = 4
    val zig = Seq(1L, 3L, 2L, 4L, 1L, 5L).zipWithIndex
      .map { case (x, t) => ("k", t.toLong, x) }.toDF("key", "t", "x")
    val r = Stats.turningPointTest(zig, "key", "t", "x").collect().head
    assert(r.getAs[Long]("turning_points") == 4L)
    assert(math.abs(r.getAs[Double]("expected_tp") - 8.0 / 3) < 1e-15)
    assert(math.abs(r.getAs[Double]("z_score") -
      (4.0 - 8.0 / 3) / math.sqrt(67.0 / 90.0)) < 1e-12)
    // constant series: ties are not extrema -> T = 0
    val flat = (0L to 3L).map(t => ("k", t, 2L)).toDF("key", "t", "x")
    val f = Stats.turningPointTest(flat, "key", "t", "x").collect().head
    assert(f.getAs[Long]("turning_points") == 0L)
  }

  test("kupiecPof: hand-computed LR and the x = 0 limit") {
    import org.apache.spark.sql.functions.lit
    // train 1..10 -> 20% VaR = 2.8 (R-7); test [1,2,5,6,7] -> x = 2/5
    val s = ((1L to 10L).map(t => ("k", t, t.toDouble)) ++
      Seq(11L -> 1.0, 12L -> 2.0, 13L -> 5.0, 14L -> 6.0, 15L -> 7.0)
        .map { case (t, x) => ("k", t, x) }).toDF("key", "t", "x")
    val r = Stats.kupiecPof(s, "key", "t", "x", lit(11L), 0.2)
      .collect().head
    assert(math.abs(r.getAs[Double]("var_p") - 2.8) < 1e-12)
    assert(r.getAs[Long]("x_exc") == 2L)
    val expLr = -2.0 * (3 * math.log(0.8) + 2 * math.log(0.2) -
      3 * math.log(0.6) - 2 * math.log(0.4))
    assert(math.abs(r.getAs[Double]("lr_pof") - expLr) < 1e-12)
    // zero exceptions: 0*ln0 limit -> LR = -2 * n * ln(1-p)
    val s0 = ((1L to 10L).map(t => ("k", t, t.toDouble)) ++
      (11L to 15L).map(t => ("k", t, 50.0))).toDF("key", "t", "x")
    val r0 = Stats.kupiecPof(s0, "key", "t", "x", lit(11L), 0.2)
      .collect().head
    assert(r0.getAs[Long]("x_exc") == 0L)
    assert(math.abs(r0.getAs[Double]("lr_pof") - (-10.0 * math.log(0.8)))
      < 1e-12)
  }

  test("burrowsDelta: identical slices have zero distance") {
    val docs = Seq(("A", "p q r"), ("B", "p q r")).toDF("source", "text")
    // every term's sigma is 0 -> no usable terms -> no output pair rows
    assert(TextAnalysis.burrowsDelta(docs, "source", "text", 3).count() == 0)
    // add a third slice that differs: A-B distance exists and is 0 only
    // for the pair with identical profiles
    val docs3 = Seq(("A", "p q"), ("B", "p q"), ("C", "p p p q"))
      .toDF("source", "text")
    val m = TextAnalysis.burrowsDelta(docs3, "source", "text", 2).collect()
      .map(r => (r.getAs[String]("slice_a"), r.getAs[String]("slice_b")) ->
        r.getAs[Double]("delta")).toMap
    assert(math.abs(m(("A", "B"))) < 1e-12)
    assert(m(("A", "C")) > 1.0 && m(("B", "C")) > 1.0)
    assert(math.abs(m(("A", "C")) - m(("B", "C"))) < 1e-12)
  }
}
