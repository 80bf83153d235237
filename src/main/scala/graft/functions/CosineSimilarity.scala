package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `cosine_similarity(a, b)` — cosine of two numeric-array columns,
  * accumulated in double, sequential element order (bit-compatible with a
  * left-fold over the array, which the DuckDB oracle replicates).
  *
  * Exists because the composed `aggregate`/`zip_with` higher-order form is
  * interpreted per element with closure dispatch and intermediate array
  * allocation — measured ~100 µs/row at 64 dims, which dominates any
  * candidate-verification join. This is one tight loop over the unsafe array
  * data, no allocation, and it code-generates as a primitive-returning call
  * (no CodegenFallback row boxing) so the surrounding projection stays in
  * whole-stage codegen.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<FLOAT|DOUBLE>, got ${left.dataType.sql}, ${right.dataType.sql}")

  @transient private lazy val leftFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** The kernel, callable from generated code: primitive in, primitive out. */
  def compute(l: ArrayData, r: ArrayData): Double = {
    val n = math.min(l.numElements(), r.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftFloat) l.getFloat(i).toDouble else l.getDouble(i)
      val y = if (rightFloat) r.getFloat(i).toDouble else r.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosKernel", this, classOf[CosineSimilarity].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}
