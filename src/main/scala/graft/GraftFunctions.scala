package graft

import graft.functions.{ApproxDistinct, ApproxQuantiles, ApproxTopK, BloomAgg, CosineSimilarity, HyperplaneLsh, LangId, MightContain, QualityScore, ShingleHashes, SimHash, SketchEstimate, SketchIntersectionEstimate, SketchUnion, ThetaDifference, ThetaEstimate, ThetaFraction, ThetaIntersect, ThetaJaccard, ThetaRetained, ThetaSketchAgg, ThetaUnion}
import graft.functions.{CmEstimate, CmTotal, CountMinAgg}
import graft.functions.{AgmsAgg, AgmsF2, AgmsJoinSize}
import graft.functions.DdQuantiles
import graft.sketch.{DdSketch, KllDoubles, ThetaSketch}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.GraftBridge

/** User-facing function surface of the engine: DataFrame `Column` API plus
  * SQL registration, replacing the reference's Hive deployment surface
  * (`ADD JAR` + `CREATE TEMPORARY FUNCTION`, README.markdown:5).
  *
  * SQL usage after [[GraftFunctions.register]] (matches the reference's
  * documented call shapes, UDAFCardinalityEstimator.java:66-68):
  * {{{
  *   SELECT k, approx_distinct(x) FROM t GROUP BY k
  *   SELECT approx_distinct(x, 'lc', 1000000) FROM t
  *   SELECT approx_distinct(stored_sketch_struct) FROM daily  -- re-aggregation
  *   SELECT sketch_estimate(s), sketch_union(s1, s2),
  *          sketch_intersection_estimate(s1, s2), sketch_merge_agg(bin) ...
  * }}}
  */
object GraftFunctions {

  private def col(e: Expression): Column = GraftBridge.column(e)
  private def expr(c: Column): Expression = GraftBridge.expression(c)

  private def approxDistinctExpr(exprs: Seq[Expression], mergeBinary: Boolean): Expression = {
    val (c, algo, p) = exprs match {
      case Seq(c) => (c, Literal("hll"), Literal(-1))
      case Seq(c, a) => (c, a, Literal(-1))
      case Seq(c, a, p) => (c, a, p)
      case _ => throw new IllegalArgumentException(
        "approx_distinct requires 1 to 3 arguments: (col[, algo[, precision]])")
    }
    ApproxDistinct(c, algo, p, mergeBinary = mergeBinary)
  }

  /** `approx_distinct(col)` with defaults (HLL, b=16). */
  def approx_distinct(c: Column): Column =
    col(approxDistinctExpr(Seq(expr(c)), mergeBinary = false).asInstanceOf[ApproxDistinct]
      .toAggregateExpression())

  /** `approx_distinct(col, algo, precision)`; algo in {"hll","lc"}; precision
    * -1 = default (HLL b=16 / LC 1,000,000 bytes). */
  def approx_distinct(c: Column, algo: String, precision: Int = -1): Column =
    col(ApproxDistinct(expr(c), Literal(algo), Literal(precision)).toAggregateExpression())

  /** Aggregate-merge of a BINARY serialized-sketch column (our analogue of
    * Spark's `hll_union_agg` convention; the struct path of `approx_distinct`
    * covers the reference's own re-aggregation form). */
  def sketch_merge_agg(c: Column): Column =
    col(ApproxDistinct(expr(c), Literal("hll"), Literal(-1), mergeBinary = true)
      .toAggregateExpression())

  /** `approx_top_k(item, k, capacity)` — mergeable SpaceSaving heavy
    * hitters (see [[graft.functions.ApproxTopK]]). */
  def approx_top_k(c: Column, k: Int = 10,
      capacity: Int = functions.ApproxTopK.DefaultCapacity): Column =
    col(ApproxTopK(expr(c), Literal(k), Literal(capacity)).toAggregateExpression())

  /** Heavy hitters ranked by a summed integral measure instead of
    * occurrence count (top brands by quantity, top tokens by doc weight). */
  def approx_top_k_weighted(c: Column, weight: Column, k: Int = 10,
      capacity: Int = functions.ApproxTopK.DefaultCapacity): Column =
    col(ApproxTopK(expr(c), Literal(k), Literal(capacity), weightExpr = expr(weight))
      .toAggregateExpression())

  /** Serialized SpaceSaving summary of a group, for storing (the heavy-
    * hitter analogue of a stored sketch). */
  def topk_sketch_agg(c: Column,
      capacity: Int = functions.ApproxTopK.DefaultCapacity): Column =
    col(ApproxTopK(expr(c), Literal(1), Literal(capacity), emitBinary = true)
      .toAggregateExpression())

  /** Aggregate-merge of BINARY serialized SpaceSaving summaries
    * (store-then-merge for heavy hitters). */
  def topk_merge_agg(c: Column, k: Int = 10,
      capacity: Int = functions.ApproxTopK.DefaultCapacity): Column =
    col(ApproxTopK(expr(c), Literal(k), Literal(capacity), mergeBinary = true)
      .toAggregateExpression())

  /** `replicate_moments_agg(h, v, r)` — single-pass per-replicate pseudo-arm
    * moments for the re-randomization test (one R×(count, exact 128-bit sum)
    * buffer per group; see [[graft.functions.ReplicateMoments]]). Replaces
    * the ×R explode + (group × replicate) aggregation with one scan. */
  def replicate_moments(h: Column, v: Column, r: Int): Column =
    col(functions.ReplicateMoments(expr(h), expr(v), Literal(r))
      .toAggregateExpression())

  /** `bootstrap_moments_agg(h, v, b)` — single-pass per-replicate
    * Poissonized-bootstrap moments (one B×(weight-sum, exact 128-bit
    * weighted sum) buffer per group; see
    * [[graft.functions.BootstrapMoments]]). */
  def bootstrap_moments(h: Column, v: Column, b: Int): Column =
    col(functions.BootstrapMoments(expr(h), expr(v), Literal(b))
      .toAggregateExpression())

  private def probsLit(probs: Seq[Double]): Expression =
    org.apache.spark.sql.catalyst.expressions.CreateArray(probs.map(Literal(_)))

  /** `approx_quantiles(x, probs, k)` — mergeable KLL quantile estimates
    * (see [[graft.functions.ApproxQuantiles]]). */
  def approx_quantiles(c: Column, probs: Seq[Double],
      k: Int = KllDoubles.DefaultK): Column =
    col(ApproxQuantiles(expr(c), probsLit(probs), Literal(k)).toAggregateExpression())

  /** Serialized KLL sketch of a group, for storing. */
  def kll_sketch_agg(c: Column, k: Int = KllDoubles.DefaultK): Column =
    col(ApproxQuantiles(expr(c), Literal(null), Literal(k), emitBinary = true)
      .toAggregateExpression())

  /** Aggregate-merge of BINARY serialized KLL sketches, evaluated at the
    * given probabilities (store-then-merge for quantiles). */
  def kll_merge_agg(c: Column, probs: Seq[Double],
      k: Int = KllDoubles.DefaultK): Column =
    col(ApproxQuantiles(expr(c), probsLit(probs), Literal(k), mergeBinary = true)
      .toAggregateExpression())

  /** `dd_quantiles(x, probs, alpha)` — mergeable DDSketch quantile
    * estimates with a RELATIVE-error guarantee (vs KLL's rank error;
    * see [[graft.functions.DdQuantiles]]). */
  def dd_quantiles(c: Column, probs: Seq[Double],
      alpha: Double = DdSketch.DefaultAlpha): Column =
    col(DdQuantiles(expr(c), probsLit(probs), Literal(alpha))
      .toAggregateExpression())

  /** Serialized DDSketch of a group, for storing. */
  def dd_sketch_agg(c: Column, alpha: Double = DdSketch.DefaultAlpha): Column =
    col(DdQuantiles(expr(c), Literal(null), Literal(alpha), emitBinary = true)
      .toAggregateExpression())

  /** Aggregate-merge of BINARY serialized DDSketches, evaluated at the
    * given probabilities (store-then-merge for relative-error
    * quantiles). */
  def dd_merge_agg(c: Column, probs: Seq[Double],
      alpha: Double = DdSketch.DefaultAlpha): Column =
    col(DdQuantiles(expr(c), probsLit(probs), Literal(alpha),
      mergeBinary = true).toAggregateExpression())

  /** `theta_sketch_agg(x, k)` — serialized theta sketch of a column
    * (distinct counting + bounded-error set algebra; see
    * [[graft.sketch.ThetaSketch]]). */
  def theta_sketch_agg(c: Column, k: Int = ThetaSketch.DefaultK): Column =
    col(ThetaSketchAgg(expr(c), Literal(k)).toAggregateExpression())

  /** Aggregate-merge of BINARY serialized theta sketches (store-then-merge
    * for set algebra). */
  def theta_merge_agg(c: Column): Column =
    col(ThetaSketchAgg(expr(c), Literal(ThetaSketch.DefaultK), mergeBinary = true)
      .toAggregateExpression())

  /** Distinct-count estimate of a stored theta sketch. */
  def theta_estimate(c: Column): Column = col(ThetaEstimate(expr(c)))

  /** Retained-entry count — with [[theta_fraction]] this exposes the
    * sketch's own error bound (RSE ≈ √(1−θ)/√(c−1)) in-query. */
  def theta_retained(c: Column): Column = col(ThetaRetained(expr(c)))

  /** Sampling fraction θ ∈ (0, 1] of a stored theta sketch. */
  def theta_fraction(c: Column): Column = col(ThetaFraction(expr(c)))

  /** Sketch of A ∪ B. */
  def theta_union(a: Column, b: Column): Column = col(ThetaUnion(expr(a), expr(b)))

  /** Sketch of A ∩ B — error proportional to the intersection, not the
    * union (the bounded-error realization of the reference stub's "set
    * intersection" TODO). */
  def theta_intersect(a: Column, b: Column): Column = col(ThetaIntersect(expr(a), expr(b)))

  /** Sketch of A \ B. */
  def theta_difference(a: Column, b: Column): Column = col(ThetaDifference(expr(a), expr(b)))

  /** Jaccard similarity estimate |A∩B| / |A∪B| from two stored theta
    * sketches (see [[graft.functions.ThetaJaccard]]). */
  def theta_jaccard(a: Column, b: Column): Column = col(ThetaJaccard(expr(a), expr(b)))

  /** `cm_sketch_agg(x, width, depth)` — serialized Count-Min sketch of a
    * column (point-frequency estimates; see [[graft.sketch.CountMin]]). */
  def cm_sketch_agg(c: Column, width: Int = graft.sketch.CountMin.DefaultWidth,
      depth: Int = graft.sketch.CountMin.DefaultDepth): Column =
    col(CountMinAgg(expr(c), Literal(width), Literal(depth)).toAggregateExpression())

  /** Aggregate-merge of BINARY serialized Count-Min sketches
    * (store-then-merge; additive — follow the append-once store discipline).
    * Takes no width/depth: the stored sketches carry their own shape. CM
    * counters genuinely cannot re-bin, so sketches of DIFFERENT shapes in
    * one store raise a [[graft.sketch.SketchMergeException]] at merge time
    * (unlike SpaceSaving/KLL/theta, which widen to the weaker parameter). */
  def cm_merge_agg(c: Column,
      width: Int = graft.sketch.CountMin.DefaultWidth,
      depth: Int = graft.sketch.CountMin.DefaultDepth): Column =
    col(CountMinAgg(expr(c), Literal(width), Literal(depth),
      mergeBinary = true).toAggregateExpression())

  /** `agms_sketch_agg(x[, width[, depth]])` — serialized Count-Sketch of a
    * join-key column ([[graft.functions.AgmsAgg]]). */
  def agms_sketch_agg(c: Column,
      width: Int = graft.sketch.CountSketch.DefaultWidth,
      depth: Int = graft.sketch.CountSketch.DefaultDepth): Column =
    col(AgmsAgg(expr(c), Literal(width), Literal(depth)).toAggregateExpression())

  /** Aggregate-merge of BINARY serialized count-sketches. */
  def agms_merge_agg(c: Column): Column =
    col(new AgmsAgg(expr(c)).copy(mergeBinary = true).toAggregateExpression())

  /** `agms_join_size(a, b)` — equi-join cardinality estimate from two
    * parallel count-sketches. */
  def agms_join_size(a: Column, b: Column): Column =
    col(AgmsJoinSize(expr(a), expr(b)))

  /** `agms_f2(bin)` — second-moment (self-join size) estimate. */
  def agms_f2(c: Column): Column = col(AgmsF2(expr(c)))

  /** `cm_estimate(bin, key)` — point-frequency estimate (never under). */
  def cm_estimate(sketch: Column, key: Column): Column =
    col(CmEstimate(expr(sketch), expr(key)))

  /** `cm_total(bin)` — total offered weight of a stored count-min sketch. */
  def cm_total(sketch: Column): Column = col(CmTotal(expr(sketch)))

  /** `bloom_agg(x, numBits, numHashes)` — serialized Bloom filter of a
    * column (the runtime-filter build side; see [[graft.functions.BloomAgg]]). */
  def bloom_agg(c: Column, numBits: Int = BloomAgg.DefaultNumBits,
      numHashes: Int = BloomAgg.DefaultNumHashes): Column =
    col(BloomAgg(expr(c), Literal(numBits), Literal(numHashes)).toAggregateExpression())

  /** Aggregate-merge of BINARY serialized Bloom filters (bitwise OR). */
  def bloom_merge_agg(c: Column, numBits: Int = BloomAgg.DefaultNumBits,
      numHashes: Int = BloomAgg.DefaultNumHashes): Column =
    col(BloomAgg(expr(c), Literal(numBits), Literal(numHashes), mergeBinary = true)
      .toAggregateExpression())

  /** `might_contain(bloom, x)` — probe a serialized Bloom filter; false is
    * definitive (no false negatives). */
  def might_contain(bloom: Column, c: Column): Column =
    col(MightContain(expr(bloom), expr(c)))

  /** 64-bit Charikar SimHash of a token array (near-dup fingerprint). */
  def simhash(c: Column): Column = col(SimHash(expr(c)))

  /** SimHash with the MD5-derived token hash — bit-identically reproducible
    * by external engines (see [[graft.functions.SimHash]] scaladoc). */
  def simhash_md5(c: Column): Column = col(SimHash(expr(c), SimHash.Md5))

  /** Cosine similarity of two numeric-array columns (double accumulation). */
  def cosine_similarity(a: Column, b: Column): Column =
    col(CosineSimilarity(expr(a), expr(b)))

  /** Distinct 64-bit hashes of the word-level k-shingles of a text column. */
  def shingle_hashes(c: Column, k: Int): Column = col(ShingleHashes(expr(c), k))

  /** Single-pass MinHash-LSH band hashes of a text column (see
    * [[graft.functions.MinHashBands]]). */
  def minhash_bands(c: Column, k: Int, numPerms: Int, bands: Int): Column =
    col(functions.MinHashBands(expr(c), k, numPerms, bands))

  /** Random-hyperplane LSH signature of an embedding (one hash table). */
  def hyperplane_lsh(c: Column, dim: Int, nBits: Int, table: Int): Column =
    col(HyperplaneLsh(expr(c), dim, nBits, table))

  def sketch_estimate(c: Column): Column = col(SketchEstimate(expr(c)))
  def sketch_union(a: Column, b: Column): Column = col(SketchUnion(expr(a), expr(b)))
  def sketch_intersection_estimate(a: Column, b: Column): Column =
    col(SketchIntersectionEstimate(expr(a), expr(b)))

  @volatile private var registeredSessions = Set.empty[SparkSession]

  private def arity(name: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs =>
      if (exprs.length == n) b(exprs)
      else throw new IllegalArgumentException(
        s"$name requires exactly $n argument(s), got ${exprs.length}")

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** The complete SQL function surface: (name, usage, builder). Consumed by
    * both [[register]] (runtime, FunctionRegistry) and
    * [[GraftExtensions]] (session build time, injectFunction). */
  val sqlFunctions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("approx_distinct", "approx_distinct(col[, algo[, precision]]) - HLL/LC distinct sketch",
      (exprs: Seq[Expression]) => approxDistinctExpr(exprs, mergeBinary = false)),
    ("sketch_merge_agg", "sketch_merge_agg(bin) - merge serialized sketches",
      (exprs: Seq[Expression]) => approxDistinctExpr(exprs, mergeBinary = true)),
    ("approx_top_k", "approx_top_k(item[, k[, capacity]]) - SpaceSaving heavy hitters",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => new ApproxTopK(c)
        case Seq(c, k) => new ApproxTopK(c, k)
        case Seq(c, k, cap) => ApproxTopK(c, k, cap)
        case _ => throw new IllegalArgumentException(
          "approx_top_k requires 1 to 3 arguments: (item[, k[, capacity]])")
      }),
    ("approx_top_k_weighted", "approx_top_k_weighted(item, weight[, k[, capacity]]) - heavy hitters by summed weight",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c, w) => ApproxTopK(c, Literal(10), Literal(ApproxTopK.DefaultCapacity), weightExpr = w)
        case Seq(c, w, k) => ApproxTopK(c, k, Literal(ApproxTopK.DefaultCapacity), weightExpr = w)
        case Seq(c, w, k, cap) => ApproxTopK(c, k, cap, weightExpr = w)
        case _ => throw new IllegalArgumentException(
          "approx_top_k_weighted requires 2 to 4 arguments: (item, weight[, k[, capacity]])")
      }),
    ("topk_sketch_agg", "topk_sketch_agg(item[, capacity]) - serialized heavy-hitter summary",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => ApproxTopK(c, Literal(1), Literal(ApproxTopK.DefaultCapacity), emitBinary = true)
        case Seq(c, cap) => ApproxTopK(c, Literal(1), cap, emitBinary = true)
        case _ => throw new IllegalArgumentException(
          "topk_sketch_agg requires 1 or 2 arguments: (item[, capacity])")
      }),
    ("topk_merge_agg", "topk_merge_agg(bin[, k[, capacity]]) - merge stored heavy-hitter summaries",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => ApproxTopK(c, Literal(10), Literal(ApproxTopK.DefaultCapacity), mergeBinary = true)
        case Seq(c, k) => ApproxTopK(c, k, Literal(ApproxTopK.DefaultCapacity), mergeBinary = true)
        case Seq(c, k, cap) => ApproxTopK(c, k, cap, mergeBinary = true)
        case _ => throw new IllegalArgumentException(
          "topk_merge_agg requires 1 to 3 arguments: (bin[, k[, capacity]])")
      }),
    ("approx_quantiles", "approx_quantiles(x, probs[, k]) - KLL quantile estimates",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c, p) => new ApproxQuantiles(c, p)
        case Seq(c, p, k) => ApproxQuantiles(c, p, k)
        case _ => throw new IllegalArgumentException(
          "approx_quantiles requires 2 or 3 arguments: (x, probs[, k])")
      }),
    ("kll_sketch_agg", "kll_sketch_agg(x[, k]) - serialized KLL quantile sketch",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => ApproxQuantiles(c, Literal(null), Literal(KllDoubles.DefaultK), emitBinary = true)
        case Seq(c, k) => ApproxQuantiles(c, Literal(null), k, emitBinary = true)
        case _ => throw new IllegalArgumentException(
          "kll_sketch_agg requires 1 or 2 arguments: (x[, k])")
      }),
    ("kll_merge_agg", "kll_merge_agg(bin, probs[, k]) - merge stored KLL sketches",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c, p) => ApproxQuantiles(c, p, Literal(KllDoubles.DefaultK), mergeBinary = true)
        case Seq(c, p, k) => ApproxQuantiles(c, p, k, mergeBinary = true)
        case _ => throw new IllegalArgumentException(
          "kll_merge_agg requires 2 or 3 arguments: (bin, probs[, k])")
      }),
    ("dd_quantiles", "dd_quantiles(x, probs[, alpha]) - DDSketch RELATIVE-error quantile estimates",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c, p) => new DdQuantiles(c, p)
        case Seq(c, p, a) => DdQuantiles(c, p, a)
        case _ => throw new IllegalArgumentException(
          "dd_quantiles requires 2 or 3 arguments: (x, probs[, alpha])")
      }),
    ("dd_sketch_agg", "dd_sketch_agg(x[, alpha]) - serialized DDSketch quantile sketch",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => DdQuantiles(c, Literal(null),
          Literal(DdSketch.DefaultAlpha), emitBinary = true)
        case Seq(c, a) => DdQuantiles(c, Literal(null), a, emitBinary = true)
        case _ => throw new IllegalArgumentException(
          "dd_sketch_agg requires 1 or 2 arguments: (x[, alpha])")
      }),
    ("dd_merge_agg", "dd_merge_agg(bin, probs[, alpha]) - merge stored DDSketches",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c, p) => DdQuantiles(c, p,
          Literal(DdSketch.DefaultAlpha), mergeBinary = true)
        case Seq(c, p, a) => DdQuantiles(c, p, a, mergeBinary = true)
        case _ => throw new IllegalArgumentException(
          "dd_merge_agg requires 2 or 3 arguments: (bin, probs[, alpha])")
      }),
    ("theta_sketch_agg", "theta_sketch_agg(x[, k]) - serialized theta sketch (distinct + set algebra)",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => new ThetaSketchAgg(c)
        case Seq(c, k) => ThetaSketchAgg(c, k)
        case _ => throw new IllegalArgumentException(
          "theta_sketch_agg requires 1 or 2 arguments: (x[, k])")
      }),
    ("theta_merge_agg", "theta_merge_agg(bin) - merge stored theta sketches",
      arity("theta_merge_agg", 1)(e =>
        ThetaSketchAgg(e.head, Literal(ThetaSketch.DefaultK), mergeBinary = true))),
    ("theta_estimate", "theta_estimate(s) - distinct estimate of a theta sketch",
      arity("theta_estimate", 1)(e => ThetaEstimate(e.head))),
    ("theta_retained", "theta_retained(s) - retained entries of a theta sketch",
      arity("theta_retained", 1)(e => ThetaRetained(e.head))),
    ("theta_fraction", "theta_fraction(s) - sampling fraction of a theta sketch",
      arity("theta_fraction", 1)(e => ThetaFraction(e.head))),
    ("theta_union", "theta_union(a, b) - theta sketch of the set union",
      arity("theta_union", 2)(e => ThetaUnion(e(0), e(1)))),
    ("theta_intersect", "theta_intersect(a, b) - theta sketch of the set intersection",
      arity("theta_intersect", 2)(e => ThetaIntersect(e(0), e(1)))),
    ("theta_difference", "theta_difference(a, b) - theta sketch of the set difference",
      arity("theta_difference", 2)(e => ThetaDifference(e(0), e(1)))),
    ("theta_jaccard", "theta_jaccard(a, b) - Jaccard similarity estimate of two theta sketches",
      arity("theta_jaccard", 2)(e => ThetaJaccard(e(0), e(1)))),
    ("cm_sketch_agg", "cm_sketch_agg(x[, width[, depth]]) - serialized Count-Min frequency sketch",
      es => (es.length match {
        case 1 => new CountMinAgg(es.head)
        case 2 => new CountMinAgg(es(0), es(1))
        case 3 => CountMinAgg(es(0), es(1), es(2))
        case _ => throw new IllegalArgumentException(
          "cm_sketch_agg requires 1 to 3 arguments: (x[, width[, depth]])")
      }).toAggregateExpression()),
    // no width/depth: stored sketches carry their shape; mixed shapes can't
    // re-bin, so they fail the merge with a SketchMergeException
    ("cm_merge_agg", "cm_merge_agg(bin) - merge stored Count-Min sketches (shapes must match)",
      es => (es.length match {
        case 1 => new CountMinAgg(es.head).copy(mergeBinary = true)
        case _ => throw new IllegalArgumentException(
          "cm_merge_agg requires exactly 1 argument: (bin)")
      }).toAggregateExpression()),
    ("cm_estimate", "cm_estimate(bin, key) - point-frequency estimate from a Count-Min sketch",
      arity("cm_estimate", 2)(e => CmEstimate(e(0), e(1)))),
    ("agms_sketch_agg", "agms_sketch_agg(x[, width[, depth]]) - serialized Count-Sketch (AGMS) of a join-key column",
      es => (es.length match {
        case 1 => new AgmsAgg(es.head)
        case 2 => new AgmsAgg(es(0), es(1))
        case 3 => AgmsAgg(es(0), es(1), es(2))
        case _ => throw new IllegalArgumentException(
          "agms_sketch_agg requires 1 to 3 arguments: (x[, width[, depth]])")
      }).toAggregateExpression()),
    ("agms_merge_agg", "agms_merge_agg(bin) - merge stored count-sketches (shapes must match)",
      es => (es.length match {
        case 1 => new AgmsAgg(es.head).copy(mergeBinary = true)
        case _ => throw new IllegalArgumentException(
          "agms_merge_agg requires exactly 1 argument: (bin)")
      }).toAggregateExpression()),
    ("agms_join_size", "agms_join_size(a, b) - equi-join cardinality estimate from two parallel count-sketches",
      arity("agms_join_size", 2)(e => AgmsJoinSize(e(0), e(1)))),
    ("agms_f2", "agms_f2(bin) - second-moment (self-join size) estimate of a count-sketch",
      arity("agms_f2", 1)(e => AgmsF2(e.head))),
    ("cm_total", "cm_total(bin) - total offered weight of a Count-Min sketch",
      arity("cm_total", 1)(e => CmTotal(e.head))),
    ("bloom_agg", "bloom_agg(x[, numBits[, numHashes]]) - build a Bloom filter of a column",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => new BloomAgg(c)
        case Seq(c, b) => new BloomAgg(c, b)
        case Seq(c, b, h) => BloomAgg(c, b, h)
        case _ => throw new IllegalArgumentException(
          "bloom_agg requires 1 to 3 arguments: (x[, numBits[, numHashes]])")
      }),
    ("bloom_merge_agg", "bloom_merge_agg(bin[, numBits[, numHashes]]) - OR-merge stored Bloom filters",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => BloomAgg(c, Literal(BloomAgg.DefaultNumBits),
          Literal(BloomAgg.DefaultNumHashes), mergeBinary = true)
        case Seq(c, b) => BloomAgg(c, b, Literal(BloomAgg.DefaultNumHashes), mergeBinary = true)
        case Seq(c, b, h) => BloomAgg(c, b, h, mergeBinary = true)
        case _ => throw new IllegalArgumentException(
          "bloom_merge_agg requires 1 to 3 arguments: (bin[, numBits[, numHashes]])")
      }),
    ("might_contain", "might_contain(bloom, x) - probe a Bloom filter (no false negatives)",
      arity("might_contain", 2)(e => MightContain(e(0), e(1)))),
    ("simhash", "simhash(tokens) - 64-bit Charikar SimHash",
      arity("simhash", 1)(e => SimHash(e.head))),
    ("simhash_md5", "simhash_md5(tokens) - SimHash with cross-engine-reproducible MD5 token hash",
      arity("simhash_md5", 1)(e => SimHash(e.head, SimHash.Md5))),
    ("md5_hash64", "md5_hash64(s) - cross-engine-reproducible 64-bit hash (first 8 md5 bytes)",
      arity("md5_hash64", 1)(e => functions.Md5Hash64(e.head))),
    ("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1]",
      arity("jaro_winkler", 2)(e => functions.JaroWinkler(e(0), e(1)))),
    ("cosine_similarity", "cosine_similarity(a, b) - cosine of numeric arrays",
      arity("cosine_similarity", 2)(e => CosineSimilarity(e(0), e(1)))),
    ("shingle_hashes", "shingle_hashes(text, k) - distinct k-shingle hashes",
      arity("shingle_hashes", 2)(e => ShingleHashes(e(0), litInt(e(1), "shingle size k")))),
    ("minhash_bands", "minhash_bands(text, k, numPerms, bands) - single-pass MinHash LSH band hashes",
      arity("minhash_bands", 4)(e => functions.MinHashBands(e(0),
        litInt(e(1), "shingle size k"), litInt(e(2), "numPerms"), litInt(e(3), "bands")))),
    ("hyperplane_lsh", "hyperplane_lsh(vec, dim, nBits, table) - LSH signature",
      arity("hyperplane_lsh", 4)(e => HyperplaneLsh(e(0), litInt(e(1), "dim"),
        litInt(e(2), "nBits"), litInt(e(3), "table")))),
    ("lang_id", "lang_id(text) - stopword-overlap language ID",
      arity("lang_id", 1)(e => LangId(e.head))),
    ("quality_score", "quality_score(text) - [0,1] text quality heuristic",
      arity("quality_score", 1)(e => QualityScore(e.head))),
    ("sketch_estimate", "sketch_estimate(s) - estimate of a stored sketch",
      arity("sketch_estimate", 1)(e => SketchEstimate(e.head))),
    ("sketch_union", "sketch_union(a, b) - serialized sketch union",
      arity("sketch_union", 2)(e => SketchUnion(e(0), e(1)))),
    ("sketch_intersection_estimate",
      "sketch_intersection_estimate(a, b) - inclusion-exclusion intersection",
      arity("sketch_intersection_estimate", 2)(e => SketchIntersectionEstimate(e(0), e(1)))))

  /** Idempotently register all engine functions with a session's
    * FunctionRegistry so plain SQL can call them (the Catalyst analogue of the
    * reference's resolver entry point, UDAFCardinalityEstimator.java:100-148;
    * literal-argument validation happens in checkInputDataTypes).
    *
    * Deliberate in-session shadowing: Spark 4.1 ships DataSketches-backed
    * `theta_sketch_agg`/`theta_union`/`theta_difference` built-ins;
    * registering ours replaces them for this session so the whole theta
    * family (incl. `theta_merge_agg`, `theta_intersect`, `theta_retained`,
    * `theta_fraction`) shares ONE wire format with canonical
    * partition-invariant bytes — mixing two incompatible binary formats
    * under one name prefix would be worse than the shadow. */
  def register(spark: SparkSession): Unit = {
    if (registeredSessions.contains(spark)) return
    val reg = spark.sessionState.functionRegistry
    sqlFunctions.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    synchronized { registeredSessions += spark }
  }
}
