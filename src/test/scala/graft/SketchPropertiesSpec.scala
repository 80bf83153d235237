package graft

import graft.sketch.{Hll, LinearCounter, Sketch}

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based sketch laws (SURVEY §5.3): ∀ datasets — merge equals
  * concatenation, estimates stay in the error envelope, partition splits
  * are irrelevant. Raw ScalaCheck generators with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache). */
class SketchPropertiesSpec extends AnyFunSuite {

  private def hash(v: Long): Long = XXH64.hashLong(v, 42L)

  private def hllOf(vs: Seq[Long], b: Int = 14): Hll = {
    val h = new Hll(b)
    vs.foreach(v => h.offerHash(hash(v)))
    h
  }

  private val longs = Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
  private val dupHeavy = Gen.listOf(Gen.choose(0L, 100L))

  private def samples(g: Gen[List[Long]], n: Int = 100): Seq[List[Long]] =
    (1 to n).flatMap { i =>
      g.apply(Gen.Parameters.default.withSize(i * 7 % 97 + 3), Seed(i.toLong))
    }

  test("merged sketch of any split is bit-identical to one-shot") {
    for ((vs, i) <- samples(longs).zipWithIndex) {
      val k = if (vs.isEmpty) 0 else i % (vs.length + 1)
      val (a, b) = vs.splitAt(k)
      val ha = hllOf(a); ha.mergeInPlace(hllOf(b))
      assert(java.util.Arrays.equals(ha.serialize(), hllOf(vs).serialize()))
    }
  }

  test("estimate within envelope for random data") {
    for (vs <- samples(longs)) {
      val d = vs.distinct.length
      if (d > 0) {
        val est = hllOf(vs).estimate
        val sigma = 1.04 / math.sqrt(1 << 14)
        assert(math.abs(est - d).toDouble / d <= 5 * sigma + 2.0 / d,
          s"est=$est exact=$d")
      }
    }
  }

  test("duplicate-heavy data: near-exact small-range behavior") {
    for (vs <- samples(dupHeavy)) {
      val d = vs.distinct.length
      val est = hllOf(vs).estimate
      assert(math.abs(est - d) <= math.max(1, d / 50), s"est=$est exact=$d")
    }
  }

  test("serialization round-trips for arbitrary content") {
    for (vs <- samples(longs, 50)) {
      val h = hllOf(vs)
      assert(java.util.Arrays.equals(
        Sketch.deserialize(h.serialize()).serialize(), h.serialize()))
      val lc = new LinearCounter(1024)
      vs.foreach(v => lc.offerHash(hash(v)))
      assert(java.util.Arrays.equals(
        Sketch.deserialize(lc.serialize()).serialize(), lc.serialize()))
    }
  }

  test("CountSketch: merge of any split is counter-identical to one-shot; join size unbiased-ish") {
    import graft.sketch.CountSketch
    def csOf(s: Seq[Long], w: Int = 256) = {
      val cs = new CountSketch(5, w)
      s.foreach(v => cs.offerHash(XXH64.hashLong(v,
        graft.functions.AgmsFunctions.HashSeed)))
      cs
    }
    for ((vs, i) <- samples(dupHeavy).zipWithIndex) {
      val k = if (vs.isEmpty) 0 else i % (vs.length + 1)
      val (a, b) = vs.splitAt(k)
      val ca = csOf(a); ca.mergeInPlace(csOf(b))
      assert(java.util.Arrays.equals(ca.serialize(), csOf(vs).serialize()),
        s"split at $k diverged")
      // self inner product vs true F2 within the 4-sigma AGMS bound
      val f2 = vs.groupBy(identity).values.map(g => g.size.toLong * g.size).sum
      val bound = 4.0 * math.sqrt(2.0 * f2.toDouble * f2.toDouble / 256)
      assert(math.abs(csOf(vs).f2() - f2) <= math.max(bound, 1.0),
        s"F2 est ${csOf(vs).f2()} vs $f2 (bound $bound)")
    }
  }

  test("LC merge of any split equals one-shot") {
    for ((vs, i) <- samples(dupHeavy).zipWithIndex) {
      val k = if (vs.isEmpty) 0 else i % (vs.length + 1)
      val (a, b) = vs.splitAt(k)
      def lcOf(s: Seq[Long]) = {
        val lc = new LinearCounter(512)
        s.foreach(v => lc.offerHash(hash(v)))
        lc
      }
      val la = lcOf(a); la.mergeInPlace(lcOf(b))
      assert(java.util.Arrays.equals(la.serialize(), lcOf(vs).serialize()))
    }
  }
}
