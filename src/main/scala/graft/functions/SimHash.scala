package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `simhash(tokens)` — Charikar (2002) 64-bit SimHash over a token array.
  *
  * Each token's 64-bit hash votes ±1 per bit position; the result bit is the
  * sign of the vote sum. Near-duplicate documents land within a small Hamming
  * distance (use `bit_count(a ^ b)` — a codegen'd builtin — to measure).
  *
  * A custom Catalyst expression (not a Scala UDF): operates on the internal
  * ArrayData/UTF8String representation with zero copying or boxing per token,
  * and code-generates as a primitive-returning kernel call.
  */
case class SimHash(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects ARRAY<STRING>, got ${other.sql}")
  }

  /** The kernel, callable from generated code: primitive-returning. */
  def computeHash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), ApproxDistinct.HashSeed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(computeHash(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashKernel", this, classOf[SimHash].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computeHash($a);")
  }

  override protected def withNewChildInternal(c: Expression): SimHash = copy(child = c)
}
