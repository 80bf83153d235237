package graft.functions

import graft.sketch.DdSketch

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `dd_quantiles(x, array(p1, ...)[, alpha])` — mergeable DDSketch
  * quantile estimates with a RELATIVE-error guarantee: each returned
  * estimate is within α of the true quantile VALUE (vs KLL's rank-error
  * bound — see [[graft.sketch.DdSketch]] for why both families exist).
  * Returns `ARRAY<DOUBLE>`, NULL for an empty group. Same
  * `TypedImperativeAggregate` pattern as `approx_quantiles`: one
  * log-bucket histogram per group crosses the shuffle, partial
  * aggregation is exact bucket-count addition (deterministic — any
  * partitioning yields the identical sketch below the bucket cap).
  *
  * `dd_sketch_agg(x[, alpha])` (emitBinary) returns the serialized
  * sketch for storing; `dd_merge_agg(bin, probs)` (mergeBinary)
  * re-aggregates stored sketches — one sketch per partition/day,
  * any percentile over any day range later, no raw rescan.
  */
case class DdQuantiles(
    child: Expression,
    probsExpr: Expression,
    alphaExpr: Expression,
    mergeBinary: Boolean = false,
    emitBinary: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DdSketch] {

  def this(child: Expression, probs: Expression) =
    this(child, probs, Literal(DdSketch.DefaultAlpha))

  override def children: Seq[Expression] = Seq(child, probsExpr, alphaExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), probsExpr = newChildren(1),
      alphaExpr = newChildren(2))

  override def withNewMutableAggBufferOffset(newOffset: Int): DdQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DdQuantiles =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = true
  override def dataType: DataType =
    if (emitBinary) BinaryType else ArrayType(DoubleType, containsNull = false)
  override def prettyName: String =
    if (emitBinary) "dd_sketch_agg"
    else if (mergeBinary) "dd_merge_agg"
    else "dd_quantiles"

  @transient private lazy val alpha: Double =
    Option(alphaExpr.eval()).map(_.asInstanceOf[Number].doubleValue())
      .getOrElse(DdSketch.DefaultAlpha)
  @transient private lazy val probs: Array[Double] =
    Option(probsExpr.eval()) match {
      case Some(a: ArrayData) => a.toDoubleArray()
      case _ => Array.empty[Double]
    }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!probsExpr.foldable || !alphaExpr.foldable)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName: probabilities and alpha must be foldable literals")
    if (alpha < 1e-4 || alpha > 0.5)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName: alpha must be in [1e-4, 0.5], got $alpha")
    if (!emitBinary) {
      probsExpr.dataType match {
        case ArrayType(DoubleType, _) =>
        case dt => return TypeCheckResult.TypeCheckFailure(
          s"$prettyName: probabilities must be ARRAY<DOUBLE>, got ${dt.sql}")
      }
      if (probs.isEmpty)
        return TypeCheckResult.TypeCheckFailure(
          s"$prettyName: at least one probability required")
      if (probs.exists(p => p < 0.0 || p > 1.0 || p.isNaN))
        return TypeCheckResult.TypeCheckFailure(
          s"$prettyName: probabilities must be in [0,1], got ${probs.mkString(",")}")
    }
    child.dataType match {
      case BinaryType if mergeBinary => TypeCheckResult.TypeCheckSuccess
      case _ if mergeBinary => TypeCheckResult.TypeCheckFailure(
        s"dd_merge_agg expects a BINARY serialized ddsketch, got ${child.dataType.sql}")
      case _: NumericType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: expects a numeric column, got ${dt.sql}")
    }
  }

  @transient private lazy val toDouble: Any => Double = child.dataType match {
    case DoubleType => v => v.asInstanceOf[Double]
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case LongType => v => v.asInstanceOf[Long].toDouble
    case IntegerType => v => v.asInstanceOf[Int].toDouble
    case ShortType => v => v.asInstanceOf[Short].toDouble
    case ByteType => v => v.asInstanceOf[Byte].toDouble
    case _: DecimalType =>
      v => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case _ => v => v.asInstanceOf[Number].doubleValue()
  }

  override def createAggregationBuffer(): DdSketch = new DdSketch(alpha)

  override def update(buffer: DdSketch, input: InternalRow): DdSketch = {
    val v = child.eval(input)
    if (v != null) {
      if (mergeBinary)
        buffer.mergeInPlace(DdSketch.deserialize(v.asInstanceOf[Array[Byte]]))
      else buffer.update(toDouble(v))
    }
    buffer
  }

  override def merge(buffer: DdSketch, input: DdSketch): DdSketch = {
    buffer.mergeInPlace(input)
    buffer
  }

  override def eval(buffer: DdSketch): Any = {
    if (buffer.n == 0L) null
    else if (emitBinary) buffer.serialize()
    else new GenericArrayData(probs.map(buffer.quantile))
  }

  override def serialize(buffer: DdSketch): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): DdSketch =
    DdSketch.deserialize(bytes)
}
