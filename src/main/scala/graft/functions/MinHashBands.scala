package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_bands(text, k, numPerms, bands)` — the complete
  * shingle → MinHash-signature → LSH-band-hash computation as ONE per-row
  * kernel, returning the `bands` band hashes.
  *
  * This is the shape that survives 100 TB: signature computation is
  * embarrassingly per-row, so it belongs in a projection, not an
  * aggregation. The previous formulation (explode shingles → groupBy(id)
  * with one min-aggregate per permutation) was chosen to dodge the
  * CollapseProject re-inlining trap of composed Column expressions — but it
  * costs a shuffle per consumer, and column pruning specializes the
  * aggregate per consumer so the plan re-evaluates the whole explode+agg
  * pipeline once for candidate generation and once per verification join
  * side (three parquet scans with two aggregations each, measured on the
  * q45 plan). A single opaque kernel has neither problem: no shuffle, no
  * re-inlining (one expression node), and re-evaluating it per consumer is
  * a projection, not an aggregation.
  *
  * Permutation family: `perm_i(h) = xxh64(h, seed = i)`; band hash = xxh64
  * fold over the band's signature rows from seed 42. Identical shingle
  * semantics to [[ShingleHashes]] (shared kernel), so verification joins
  * see exactly the sets the signature was built from.
  */
case class MinHashBands(child: Expression, k: Int, numPerms: Int, bands: Int)
  extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")
  require(numPerms >= 1, s"numPerms must be >= 1, got $numPerms")
  require(bands >= 1 && numPerms % bands == 0,
    s"bands must divide numPerms, got numPerms=$numPerms bands=$bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${other.sql}")
  }

  /** The kernel, callable from generated code. */
  def computeBands(u: UTF8String): GenericArrayData = {
    val hs = ShingleHashes.distinctHashes(u, k)
    val sig = new Array[Long](numPerms)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    while (j < hs.length) {
      val h = hs(j)
      var i = 0
      while (i < numPerms) {
        val p = XXH64.hashLong(h, i.toLong)
        if (p < sig(i)) sig(i) = p
        i += 1
      }
      j += 1
    }
    val rows = numPerms / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 42L
      var r = 0
      while (r < rows) {
        acc = XXH64.hashLong(sig(b * rows + r), acc)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = computeBands(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashKernel", this, classOf[MinHashBands].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computeBands($a);")
  }

  override protected def withNewChildInternal(c: Expression): MinHashBands = copy(child = c)
}
