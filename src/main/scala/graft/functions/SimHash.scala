package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * ArrayData/UTF8String representation with zero copying or boxing per token.
  * CodegenFallback is acceptable: the surrounding projection still codegens,
  * and the per-row cost is dominated by hashing, not the virtual call.
  */
case class SimHash(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects ARRAY<STRING>, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
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
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): SimHash = copy(child = c)
}
