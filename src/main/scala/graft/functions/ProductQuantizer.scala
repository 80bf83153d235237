package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — the standard memory-bound
  * scale path for embedding search: split a `dim`-vector into `m` subspaces,
  * quantize each to one of `ksub` trained sub-centroids, and search over the
  * m-byte codes instead of the raw floats.
  *
  * At 100 TB the point is arithmetic AND I/O compression: a 64-dim float
  * corpus stores 256 B/vector raw but m=8, ksub=16 codes store 8 B/vector —
  * candidate generation scans 32× less data, and the asymmetric-distance
  * lookup table (ADC, one per query) turns each candidate score into m table
  * reads instead of a dim-length dot product. Raw vectors are fetched only
  * for the final exact rerank of the shortlist.
  *
  * Both kernels follow the [[CosineSimilarity]]/[[HyperplaneLsh]] design:
  * custom expressions with a tight primitive loop and `doGenCode` emitting a
  * single kernel call, so the surrounding projection stays in whole-stage
  * codegen. The codebook/LUTs ride in the expression (model parameters —
  * m·ksub·dsub doubles, a few KiB — not data) and serialize with the plan to
  * every executor like any broadcast model.
  */

/** `PqEncode(vec)` — quantize an ARRAY<FLOAT|DOUBLE> of length ≥ `dim` to
  * its m nearest-sub-centroid codes (L2 per subspace, ties to the lower
  * code). Output: ARRAY<INT> of length m, each in [0, ksub). */
case class PqEncode(child: Expression, codebook: Array[Double],
    dim: Int, m: Int, ksub: Int) extends UnaryExpression {

  require(m >= 1 && dim % m == 0,
    s"pq_encode needs dim divisible by m, got dim=$dim m=$m")
  require(ksub >= 1, s"pq_encode needs ksub >= 1, got $ksub")
  require(codebook.length == m * ksub * (dim / m),
    s"codebook length ${codebook.length} != m*ksub*dsub = ${m * ksub * (dim / m)}")

  private val dsub = dim / m

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** The kernel, callable from generated code. */
  def computeCodes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val off = (j * ksub + c) * dsub
        var d2 = 0.0
        var t = 0
        while (t < dsub) {
          val i = j * dsub + t
          val x = if (i >= n) 0.0
                  else if (isFloat) arr.getFloat(i).toDouble
                  else arr.getDouble(i)
          val diff = x - codebook(off + t)
          d2 += diff * diff
          t += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(v: Any): Any = computeCodes(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncKernel", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computeCodes($a);")
  }

  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
}

/** `PqAdcCosine(codes)` — asymmetric-distance cosine approximation of one
  * query against a code row: with per-query lookup tables
  * `ipLut[j·ksub+c] = ⟨q_j, centroid_{j,c}⟩` and
  * `sqLut[j·ksub+c] = ‖centroid_{j,c}‖²`,
  * cos(q, x) ≈ Σ_j ipLut[j, code_j] / (‖q‖ · sqrt(Σ_j sqLut[j, code_j])) —
  * m lookups per candidate, no float-vector access. */
case class PqAdcCosine(child: Expression, ipLut: Array[Double],
    sqLut: Array[Double], m: Int, ksub: Int, qNorm: Double)
  extends UnaryExpression {

  require(ipLut.length == m * ksub && sqLut.length == m * ksub,
    s"LUTs must be m*ksub = ${m * ksub} doubles, got ${ipLut.length}/${sqLut.length}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_cosine"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_cosine expects ARRAY<INT> codes, got ${other.sql}")
  }

  /** The kernel, callable from generated code: primitive-returning. */
  def computeScore(arr: ArrayData): Double = {
    val n = math.min(arr.numElements(), m)
    var ip = 0.0
    var n2 = 0.0
    var j = 0
    while (j < n) {
      val c = arr.getInt(j)
      if (c >= 0 && c < ksub) {
        val idx = j * ksub + c
        ip += ipLut(idx)
        n2 += sqLut(idx)
      }
      j += 1
    }
    if (n2 <= 0.0 || qNorm == 0.0) 0.0
    else ip / (qNorm * math.sqrt(n2))
  }

  override def nullSafeEval(v: Any): Any =
    java.lang.Double.valueOf(computeScore(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcKernel", this, classOf[PqAdcCosine].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computeScore($a);")
  }

  override protected def withNewChildInternal(c: Expression): PqAdcCosine = copy(child = c)
}
