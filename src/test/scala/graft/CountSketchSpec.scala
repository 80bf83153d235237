package graft

import graft.sketch.{CountSketch, SketchMergeException}

import org.scalatest.funsuite.AnyFunSuite

/** Count-Sketch (AGMS) core laws: signed-counter point estimates, the
  * merge ≡ concatenation law, parallel-sketch inner products as
  * join-size/F2 estimates, wire-format round trip, shape safety. */
class CountSketchSpec extends AnyFunSuite {

  private def hash(x: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
      x, graft.functions.AgmsFunctions.HashSeed)

  test("point estimates are exact when buckets don't collide") {
    val cs = new CountSketch(5, 1024)
    for (k <- 0L until 20L; _ <- 0 until (k.toInt + 1)) cs.offerHash(hash(k))
    // 20 keys in 1024 buckets x 5 rows: the median kills any stray
    // collision; exactness here is deterministic for these keys/seed
    for (k <- 0L until 20L)
      assert(cs.estimateHash(hash(k)) == k + 1, s"key $k")
    assert(cs.totalWeight == (1 to 20).sum.toLong)
  }

  test("merge equals concatenation, counter-exact") {
    val a = new CountSketch(5, 256)
    val b = new CountSketch(5, 256)
    val one = new CountSketch(5, 256)
    for (k <- 0L until 50L) {
      val h = hash(k)
      if (k % 2 == 0) a.offerHash(h) else b.offerHash(h)
      one.offerHash(h)
    }
    a.mergeInPlace(b)
    assert(a.serialize().toSeq == one.serialize().toSeq)
  }

  test("join size and F2: exact on collision-free keys, via the wire format") {
    val a = new CountSketch(5, 1024)
    val b = new CountSketch(5, 1024)
    // f_A = {1:2, 2:1, 3:1}, f_B = {2:3, 3:1, 4:5} -> J = 1*3 + 1*1 = 4
    Seq(1L, 1L, 2L, 3L).foreach(k => a.offerHash(hash(k)))
    Seq(2L, 2L, 2L, 3L, 4L, 4L, 4L, 4L, 4L).foreach(k => b.offerHash(hash(k)))
    val a2 = CountSketch.deserialize(a.serialize())
    val b2 = CountSketch.deserialize(b.serialize())
    assert(a2.joinSize(b2) == 4.0)
    assert(b2.joinSize(a2) == 4.0)
    assert(a2.f2() == (4 + 1 + 1).toDouble)   // 2^2 + 1 + 1
    assert(b2.f2() == (9 + 1 + 25).toDouble)
  }

  test("estimates stay within the AGMS bound on adversarially dense data") {
    val w = 64
    val a = new CountSketch(5, w)
    val b = new CountSketch(5, w)
    val rnd = new scala.util.Random(3)
    val fa = (0L until 500L).map(k => k -> (rnd.nextInt(5) + 1)).toMap
    val fb = (250L until 750L).map(k => k -> (rnd.nextInt(5) + 1)).toMap
    fa.foreach { case (k, f) => (0 until f).foreach(_ => a.offerHash(hash(k))) }
    fb.foreach { case (k, f) => (0 until f).foreach(_ => b.offerHash(hash(k))) }
    val j = fa.keySet.intersect(fb.keySet).toSeq.map(k => fa(k).toLong * fb(k)).sum
    val f2a = fa.values.map(f => f.toLong * f).sum
    val f2b = fb.values.map(f => f.toLong * f).sum
    val bound = 4.0 * math.sqrt((f2a.toDouble * f2b + j.toDouble * j) / w)
    assert(math.abs(a.joinSize(b) - j) <= bound,
      s"est ${a.joinSize(b)} vs exact $j, bound $bound")
  }

  test("shape mismatch fails clean; corrupted bytes rejected") {
    val a = new CountSketch(5, 256)
    val b = new CountSketch(5, 512)
    intercept[SketchMergeException](a.mergeInPlace(b))
    intercept[SketchMergeException](a.joinSize(b))
    intercept[SketchMergeException](CountSketch.deserialize(Array[Byte](1, 2, 3)))
    // a CountMin wire blob must not deserialize as a count-sketch
    val cm = new graft.sketch.CountMin(2, 16)
    intercept[SketchMergeException](CountSketch.deserialize(cm.serialize()))
  }

  test("SQL surface: agms functions registered, join-size probe runs end-to-end") {
    val spark = TestSpark.session
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(1L, 1L, 2L, 3L).toDF("k").createOrReplaceTempView("agms_a")
    Seq(2L, 2L, 2L, 3L).toDF("k").createOrReplaceTempView("agms_b")
    val est = spark.sql(
      """SELECT agms_join_size(
        |  (SELECT agms_sketch_agg(k) FROM agms_a),
        |  (SELECT agms_sketch_agg(k) FROM agms_b)) AS est""".stripMargin)
      .head().getDouble(0)
    assert(est == 4.0, s"got $est") // 1*3 + 1*1, collision-free at width 1024
  }
}
