package graft.functions

import graft.sketch.Sketch

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Scalar functions over stored sketch values — realizing the intent of the
  * reference's empty `GenericUDF` stub ("TODO potential set intersection and
  * other utils", UDFCardinalityEstimator.java:30). These are plain Catalyst
  * expressions, no aggregation; they accept either the result struct
  * `{type, cardinality, binary}` (UDAFCardinalityEstimator.java:91-93) or a
  * raw serialized-sketch BINARY column.
  *
  * They run row-at-a-time over sketch rows (one per group/day — thousands,
  * not billions), so CodegenFallback is fine: the hot path at 100 TB is the
  * aggregate that PRODUCES sketches, not these combinators.
  */
private[graft] object SketchExprs {
  def isSketchStruct(dt: DataType): Boolean = dt match {
    case s: StructType =>
      s.fields.length == 3 && s.fieldNames.sameElements(Array("type", "cardinality", "binary"))
    case _ => false
  }

  def checkSketchInput(fn: String, dt: DataType): TypeCheckResult = dt match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case s: StructType if isSketchStruct(s) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn expects a sketch (BINARY or ${ApproxDistinct.resultType.sql}), got ${other.sql}")
  }

  /** Extract serialized sketch bytes from a non-null input value. */
  def bytesOf(v: Any, dt: DataType): Array[Byte] = dt match {
    case BinaryType => v.asInstanceOf[Array[Byte]]
    case _: StructType =>
      val row = v.asInstanceOf[InternalRow]
      if (row.isNullAt(2)) null else row.getBinary(2)
    case _ => null
  }

  def sketchOf(v: Any, dt: DataType): Sketch = {
    val b = bytesOf(v, dt)
    if (b == null || b.isEmpty) null else Sketch.deserialize(b)
  }
}

/** `sketch_estimate(s)` — cardinality estimate of a stored sketch, without
  * re-aggregating. */
case class SketchEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "sketch_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    SketchExprs.checkSketchInput(prettyName, child.dataType)
  override def nullSafeEval(v: Any): Any = {
    val s = SketchExprs.sketchOf(v, child.dataType)
    if (s == null) null else java.lang.Long.valueOf(s.estimate)
  }
  override protected def withNewChildInternal(c: Expression): SketchEstimate = copy(child = c)
}

/** `sketch_union(a, b)` — serialized union of two same-algo/same-precision
  * sketches (register-wise max for HLL, bitmap OR for LC). Returns BINARY. */
case class SketchUnion(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sketch_union"
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = SketchExprs.checkSketchInput(prettyName, left.dataType)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else SketchExprs.checkSketchInput(prettyName, right.dataType)
  }
  override def nullSafeEval(lv: Any, rv: Any): Any = {
    val a = SketchExprs.sketchOf(lv, left.dataType)
    val b = SketchExprs.sketchOf(rv, right.dataType)
    if (a == null) { if (b == null) null else b.serialize() }
    else if (b == null) a.serialize()
    else { a.mergeInPlace(b); a.serialize() }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SketchUnion =
    copy(left = l, right = r)
}

/** `sketch_intersection_estimate(a, b)` — |A∩B| ≈ |A| + |B| − |A∪B| by
  * inclusion–exclusion (HLL supports union natively, intersection only this
  * way). Clamped at 0; error grows with |A∪B|/|A∩B|, as the math dictates. */
case class SketchIntersectionEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "sketch_intersection_estimate"
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = SketchExprs.checkSketchInput(prettyName, left.dataType)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else SketchExprs.checkSketchInput(prettyName, right.dataType)
  }
  override def nullSafeEval(lv: Any, rv: Any): Any = {
    val a = SketchExprs.sketchOf(lv, left.dataType)
    val b = SketchExprs.sketchOf(rv, right.dataType)
    if (a == null || b == null) null
    else {
      val estA = a.estimate
      val estB = b.estimate
      a.mergeInPlace(b) // a becomes A∪B
      java.lang.Long.valueOf(math.max(0L, estA + estB - a.estimate))
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SketchIntersectionEstimate =
    copy(left = l, right = r)
}
