package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `hyperplane_lsh(vec)` — random-hyperplane LSH signature (Charikar 2002)
  * of a float-embedding column: bit b = sign of ⟨vec, w_b⟩ for `nBits`
  * deterministic pseudo-random hyperplanes, packed into a long.
  *
  * Why an expression and not composed built-ins: the composed form is a
  * nBits × dim tree of element_at/multiply nodes — at 64 dims × 16 bits
  * that's a ~4000-node expression whose codegen compilation dominates the
  * query and whose evaluation re-walks the array per term. Here the weights
  * are derived once per task (transient lazy), and evaluation is one tight
  * loop over the vector — same plan shape, ~none of the overhead.
  *
  * Weights derive from xxhash64(table, bit, dim) mapped to [-1, 1): every
  * executor computes identical planes with no RNG state and no broadcast.
  */
case class HyperplaneLsh(child: Expression, dim: Int, nBits: Int, table: Int)
  extends UnaryExpression {

  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1,63], got $nBits")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_lsh"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_lsh expects ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val weights: Array[Double] = {
    val w = new Array[Double](nBits * dim)
    var b = 0
    while (b < nBits) {
      var d = 0
      while (d < dim) {
        val h = XXH64.hashLong((table.toLong * 131 + b) * 1048573L + d, 42L)
        w(b * dim + d) = h.toDouble / Long.MaxValue.toDouble
        d += 1
      }
      b += 1
    }
    w
  }

  /** The kernel, callable from generated code: primitive-returning. */
  def computeSig(arr: ArrayData): Long = {
    val n = math.min(arr.numElements(), dim)
    var sig = 0L
    var b = 0
    while (b < nBits) {
      var proj = 0.0
      val off = b * dim
      var d = 0
      while (d < n) {
        val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        proj += x * weights(off + d)
        d += 1
      }
      if (proj >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(computeSig(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshKernel", this, classOf[HyperplaneLsh].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computeSig($a);")
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneLsh = copy(child = c)
}
