package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `md5_hash64(s)` — first 8 bytes of MD5(s), big-endian, as a signed
  * 64-bit value (the same derivation as [[SimHash]]'s md5 variant).
  *
  * The point of MD5 over xxhash: ANY engine computes it bit-identically
  * (DuckDB: `substr(md5(s), 1, 16)` hex-parsed), so everything derived
  * from this hash — deterministic samples, simhash fingerprints,
  * hash-bucketed splits — is exactly reproducible by an external oracle,
  * not just statistically similar. Use [[TypedXxHash]]-based hashing when
  * only speed matters.
  */
case class Md5Hash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${other.sql}")
  }

  /** Kernel, callable from generated code. */
  def computeHash(u: UTF8String): Long = SimHash.md5Hash64(u.getBytes)

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(computeHash(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5h64", this, classOf[Md5Hash64].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computeHash($a);")
  }

  override protected def withNewChildInternal(c: Expression): Md5Hash64 = copy(child = c)
}
