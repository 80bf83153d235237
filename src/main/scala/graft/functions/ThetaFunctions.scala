package graft.functions

import graft.sketch.ThetaSketch

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Mutable buffer holding at most one live theta sketch (NULL-for-empty
  * group, same contract as [[SketchBuffer]]). */
final class ThetaBuffer(var sketch: ThetaSketch) extends Serializable

/** `theta_sketch_agg(x[, k])` — aggregate a column into a serialized theta
  * sketch (see [[graft.sketch.ThetaSketch]]); `theta_merge_agg(bin)` —
  * re-aggregate stored sketches (E3 store-then-merge, the same contract as
  * `sketch_merge_agg`/`topk_merge_agg`/`kll_merge_agg`). Returns BINARY;
  * combine with the scalar `theta_estimate` / `theta_union` /
  * `theta_intersect` / `theta_difference` set algebra.
  *
  * One bounded sketch per group crosses the shuffle (8(k+1) bytes of heap +
  * the dedup table per live group; k=4096 default ≈ 32 KiB retained), on the
  * same `TypedImperativeAggregate`/ObjectHashAggregateExec path as the
  * flagship `approx_distinct` (UDAFCardinalityEstimator.java:69-344).
  */
case class ThetaSketchAgg(
    child: Expression,
    kExpr: Expression,
    mergeBinary: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaBuffer] {

  def this(child: Expression) = this(child, Literal(ThetaSketch.DefaultK))

  override def children: Seq[Expression] = Seq(child, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String =
    if (mergeBinary) "theta_merge_agg" else "theta_sketch_agg"

  @transient private lazy val k: Int =
    Option(kExpr.eval()).map(_.asInstanceOf[Number].intValue())
      .getOrElse(ThetaSketch.DefaultK)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!kExpr.foldable)
      return TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be a foldable literal")
    kExpr.dataType match {
      case ByteType | ShortType | IntegerType | LongType => // ok — Number below is safe
      case dt => return TypeCheckResult.TypeCheckFailure(
        s"$prettyName: k must be an integral literal, got ${dt.sql}")
    }
    if (k < ThetaSketch.MinK || k > ThetaSketch.MaxK)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName: k must be in [${ThetaSketch.MinK}, ${ThetaSketch.MaxK}], got $k")
    child.dataType match {
      case BinaryType if mergeBinary => TypeCheckResult.TypeCheckSuccess
      case dt if mergeBinary => TypeCheckResult.TypeCheckFailure(
        s"theta_merge_agg expects a BINARY serialized theta sketch, got ${dt.sql}")
      case dt if org.apache.spark.sql.graft.GraftBridge.isAtomic(dt) =>
        TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: unsupported input type ${dt.sql}")
    }
  }

  @transient private lazy val hashFn: Any => Long =
    TypedXxHash.kernel(child.dataType, ApproxDistinct.HashSeed)

  override def createAggregationBuffer(): ThetaBuffer = new ThetaBuffer(null)

  override def update(buffer: ThetaBuffer, input: InternalRow): ThetaBuffer = {
    val v = child.eval(input)
    if (v != null) {
      if (mergeBinary) {
        val bytes = v.asInstanceOf[Array[Byte]]
        if (bytes.nonEmpty) {
          val incoming = ThetaSketch.deserialize(bytes)
          if (buffer.sketch == null) buffer.sketch = incoming
          else buffer.sketch = ThetaSketch.mergeInto(buffer.sketch, incoming)
        }
      } else {
        if (buffer.sketch == null) buffer.sketch = new ThetaSketch(k)
        buffer.sketch.offerHash(hashFn(v))
      }
    }
    buffer
  }

  override def merge(buffer: ThetaBuffer, input: ThetaBuffer): ThetaBuffer = {
    if (input.sketch != null) {
      if (buffer.sketch == null) buffer.sketch = input.sketch
      else buffer.sketch = ThetaSketch.mergeInto(buffer.sketch, input.sketch)
    }
    buffer
  }

  override def eval(buffer: ThetaBuffer): Any =
    if (buffer.sketch == null) null else buffer.sketch.serialize()

  override def serialize(buffer: ThetaBuffer): Array[Byte] =
    if (buffer.sketch == null) Array.emptyByteArray else buffer.sketch.serialize()

  override def deserialize(bytes: Array[Byte]): ThetaBuffer =
    if (bytes.isEmpty) new ThetaBuffer(null)
    else new ThetaBuffer(ThetaSketch.deserialize(bytes))
}

/** Shared input checking/decoding for the scalar theta combinators. Like the
  * HLL scalar functions ([[SketchExprs]]) these run over sketch ROWS (one per
  * group/day), not raw data, so CodegenFallback costs nothing at scale. */
private[graft] object ThetaExprs {
  def check(fn: String, dt: DataType): TypeCheckResult = dt match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn expects a BINARY serialized theta sketch, got ${other.sql}")
  }

  def sketchOf(v: Any): ThetaSketch = {
    val b = v.asInstanceOf[Array[Byte]]
    if (b == null || b.isEmpty) null else ThetaSketch.deserialize(b)
  }
}

/** `theta_estimate(s)` — distinct-count estimate of a stored theta sketch. */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    ThetaExprs.check(prettyName, child.dataType)
  override def nullSafeEval(v: Any): Any = {
    val s = ThetaExprs.sketchOf(v)
    if (s == null) null else java.lang.Long.valueOf(s.estimate)
  }
  override protected def withNewChildInternal(c: Expression): ThetaEstimate = copy(child = c)
}

/** `theta_retained(s)` — number of retained entries; with `theta_fraction`
  * this exposes the sketch's own error bound (RSE ≈ √(1−θ)/√(c−1)) to SQL,
  * which is how q72's gate is computed in-query. */
case class ThetaRetained(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_retained"
  override def checkInputDataTypes(): TypeCheckResult =
    ThetaExprs.check(prettyName, child.dataType)
  override def nullSafeEval(v: Any): Any = {
    val s = ThetaExprs.sketchOf(v)
    if (s == null) null else java.lang.Long.valueOf(s.retained.toLong)
  }
  override protected def withNewChildInternal(c: Expression): ThetaRetained = copy(child = c)
}

/** `theta_fraction(s)` — the sampling fraction θ ∈ (0, 1]. */
case class ThetaFraction(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_fraction"
  override def checkInputDataTypes(): TypeCheckResult =
    ThetaExprs.check(prettyName, child.dataType)
  override def nullSafeEval(v: Any): Any = {
    val s = ThetaExprs.sketchOf(v)
    if (s == null) null else java.lang.Double.valueOf(s.thetaFraction)
  }
  override protected def withNewChildInternal(c: Expression): ThetaFraction = copy(child = c)
}

private[graft] sealed abstract class ThetaBinaryOp extends BinaryExpression
  with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = ThetaExprs.check(prettyName, left.dataType)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else ThetaExprs.check(prettyName, right.dataType)
  }
  protected def op(a: ThetaSketch, b: ThetaSketch): ThetaSketch
  /** The identity for union is the empty set; for intersect/difference a
    * missing side makes the result undefined → NULL. */
  protected def unionLike: Boolean
  // eval is overridden (not just nullSafeEval) so SQL NULL — what the
  // aggregates emit for an empty group — is treated as the empty set:
  // BinaryExpression.eval would otherwise short-circuit a NULL child to
  // NULL before nullSafeEval runs, making theta_union(NULL, s) NULL
  // instead of s. Empty BINARY and NULL are interchangeable empties.
  override def eval(input: InternalRow): Any = {
    val lv = left.eval(input)
    val rv = right.eval(input)
    if (!unionLike && (lv == null || rv == null)) return null
    val a = ThetaExprs.sketchOf(lv)
    val b = ThetaExprs.sketchOf(rv)
    if (a == null) { if (unionLike && b != null) b.serialize() else null }
    else if (b == null) { if (unionLike) a.serialize() else null }
    else op(a, b).serialize()
  }
  override def nullSafeEval(lv: Any, rv: Any): Any =
    throw new IllegalStateException(s"$prettyName: eval is overridden")
}

/** `theta_union(a, b)` — sketch of A ∪ B (canonical, same as the aggregate
  * merge). */
case class ThetaUnion(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def prettyName: String = "theta_union"
  override protected def unionLike: Boolean = true
  override protected def op(a: ThetaSketch, b: ThetaSketch): ThetaSketch =
    ThetaSketch.union(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaUnion =
    copy(left = l, right = r)
}

/** `theta_intersect(a, b)` — sketch of A ∩ B with error proportional to the
  * INTERSECTION size (the bounded-error answer to the reference stub's "set
  * intersection" TODO, UDFCardinalityEstimator.java:30 — vs the
  * inclusion–exclusion `sketch_intersection_estimate`, whose error scales
  * with the union). */
case class ThetaIntersect(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def prettyName: String = "theta_intersect"
  override protected def unionLike: Boolean = false
  override protected def op(a: ThetaSketch, b: ThetaSketch): ThetaSketch =
    ThetaSketch.intersect(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaIntersect =
    copy(left = l, right = r)
}

/** `theta_jaccard(a, b)` — Jaccard similarity estimate |A∩B| / |A∪B| from
  * two stored theta sketches: both set expressions are evaluated at the
  * common θ = min(θ_A, θ_B), so this is the standard theta/KMV Jaccard
  * estimator (the sketch-level analogue of the exact n-gram Jaccard the
  * dedup operators compute per pair — usable on corpus-level sketches
  * where materializing either set is off the table). NULL and the empty
  * sketch are the empty set: J(∅, B) = 0, J(∅, ∅) = NULL (0/0). */
case class ThetaJaccard(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_jaccard"
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = ThetaExprs.check(prettyName, left.dataType)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else ThetaExprs.check(prettyName, right.dataType)
  }
  // same NULL-as-empty discipline as the union-like ThetaBinaryOps
  override def eval(input: InternalRow): Any = {
    val a = ThetaExprs.sketchOf(left.eval(input))
    val b = ThetaExprs.sketchOf(right.eval(input))
    if (a == null && b == null) null
    else if (a == null || b == null) java.lang.Double.valueOf(0.0)
    else {
      val u = ThetaSketch.union(a, b).estimateDouble
      if (u == 0.0) null
      else java.lang.Double.valueOf(ThetaSketch.intersect(a, b).estimateDouble / u)
    }
  }
  override def nullSafeEval(lv: Any, rv: Any): Any =
    throw new IllegalStateException(s"$prettyName: eval is overridden")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaJaccard =
    copy(left = l, right = r)
}

/** `theta_difference(a, b)` — sketch of A \ B (same sampling argument as
  * intersection). */
case class ThetaDifference(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def prettyName: String = "theta_difference"
  override protected def unionLike: Boolean = false
  override protected def op(a: ThetaSketch, b: ThetaSketch): ThetaSketch =
    ThetaSketch.difference(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaDifference =
    copy(left = l, right = r)
}
