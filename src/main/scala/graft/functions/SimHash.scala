package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `simhash(tokens)` — Charikar (2002) 64-bit SimHash over a token array.
  *
  * Each token's 64-bit hash votes ±1 per bit position; the result bit is the
  * sign of the vote sum. Near-duplicate documents land within a small Hamming
  * distance (use `bit_count(a ^ b)` — a codegen'd builtin — to measure).
  *
  * Two token-hash algorithms:
  *  - `xxh64` (default): Spark's XXH64 kernel — the throughput path;
  *  - `md5`: first 8 big-endian bytes of the MD5 digest. MD5 is computable
  *    bit-identically by any engine (DuckDB: `md5(t)` hex → first 16 chars),
  *    which makes simhash-based queries *exactly* verifiable by an external
  *    oracle — no approximation envelope. ~2-3× slower per token than xxh64;
  *    pick it when cross-engine reproducibility matters more than hash speed.
  * The fingerprint structure, blocking and Hamming verify are identical for
  * both; recall/precision of near-dup mining is hash-agnostic.
  *
  * A custom Catalyst expression (not a Scala UDF): operates on the internal
  * ArrayData/UTF8String representation with zero copying or boxing per token
  * (xxh64 path), and code-generates as a primitive-returning kernel call.
  */
case class SimHash(child: Expression, algo: String = SimHash.Xxh64)
  extends UnaryExpression {

  require(algo == SimHash.Xxh64 || algo == SimHash.Md5,
    s"simhash algo must be '${SimHash.Xxh64}' or '${SimHash.Md5}', got '$algo'")

  override def dataType: DataType = LongType
  override def prettyName: String = if (algo == SimHash.Md5) "simhash_md5" else "simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${other.sql}")
  }

  private val useMd5 = algo == SimHash.Md5

  /** The kernel, callable from generated code: primitive-returning. */
  def computeHash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val u = arr.getUTF8String(i)
        val h =
          if (useMd5) SimHash.md5Hash64(u.getBytes)
          else XXH64.hashUTF8String(u, ApproxDistinct.HashSeed)
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

object SimHash {
  val Xxh64 = "xxh64"
  val Md5 = "md5"

  // MessageDigest is stateful; reference objects can be shared across tasks
  // in the same JVM, so the digest instance is per-thread.
  private val md5Local = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 8 bytes of MD5(bytes), big-endian — matches DuckDB's
    * `substr(md5(t), 1, 16)` parsed as an unsigned 64-bit hex number. */
  def md5Hash64(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) | ((d(2) & 0xFFL) << 40) |
      ((d(3) & 0xFFL) << 32) | ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
  }
}
