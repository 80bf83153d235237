package graft.functions

import graft.sketch.KllDoubles

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `approx_quantiles(x, array(p1, p2, ...)[, k])` — mergeable KLL quantile
  * estimates (see [[graft.sketch.KllDoubles]]). Returns one retained-item
  * estimate per requested probability as `ARRAY<DOUBLE>`; NULL for an empty
  * group. The quantile companion to `approx_distinct` (cardinality) and
  * `approx_top_k` (frequency), on the same `TypedImperativeAggregate`
  * pattern: one O(k·log log n) sketch per group crosses the shuffle.
  *
  * `kll_sketch_agg(x[, k])` (emitBinary) returns the serialized sketch for
  * storing; `kll_merge_agg(bin, probs[, k])` (mergeBinary) re-aggregates
  * stored sketches — store-then-merge for quantiles: keep one sketch per
  * partition/day, answer any percentile over any day range later without
  * rescanning raw data.
  */
case class ApproxQuantiles(
    child: Expression,
    probsExpr: Expression,
    kExpr: Expression,
    mergeBinary: Boolean = false,
    emitBinary: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoubles] {

  def this(child: Expression, probs: Expression) =
    this(child, probs, Literal(KllDoubles.DefaultK))

  override def children: Seq[Expression] = Seq(child, probsExpr, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), probsExpr = newChildren(1), kExpr = newChildren(2))

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxQuantiles =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = true
  override def dataType: DataType =
    if (emitBinary) BinaryType else ArrayType(DoubleType, containsNull = false)
  override def prettyName: String =
    if (emitBinary) "kll_sketch_agg"
    else if (mergeBinary) "kll_merge_agg"
    else "approx_quantiles"

  @transient private lazy val k: Int =
    Option(kExpr.eval()).map(_.asInstanceOf[Number].intValue())
      .getOrElse(KllDoubles.DefaultK)
  @transient private lazy val probs: Array[Double] =
    Option(probsExpr.eval()) match {
      case Some(a: ArrayData) => a.toDoubleArray()
      case _ => Array.empty[Double]
    }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!probsExpr.foldable || !kExpr.foldable)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName: probabilities and k must be foldable literals")
    if (k < 8 || k > 65535)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName: k must be in [8, 65535], got $k")
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
        s"kll_merge_agg expects a BINARY serialized KLL sketch, got ${child.dataType.sql}")
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
    case _: DecimalType => v => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case _ => v => v.asInstanceOf[Number].doubleValue()
  }

  override def createAggregationBuffer(): KllDoubles = new KllDoubles(k)

  override def update(buffer: KllDoubles, input: InternalRow): KllDoubles = {
    val v = child.eval(input)
    if (v != null) {
      if (mergeBinary) buffer.mergeInPlace(KllDoubles.deserialize(v.asInstanceOf[Array[Byte]]))
      else buffer.update(toDouble(v))
    }
    buffer
  }

  override def merge(buffer: KllDoubles, input: KllDoubles): KllDoubles = {
    buffer.mergeInPlace(input)
    buffer
  }

  override def eval(buffer: KllDoubles): Any = {
    if (buffer.n == 0L) null
    else if (emitBinary) buffer.serialize()
    else new GenericArrayData(probs.map(buffer.quantile))
  }

  override def serialize(buffer: KllDoubles): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): KllDoubles =
    KllDoubles.deserialize(bytes)
}
