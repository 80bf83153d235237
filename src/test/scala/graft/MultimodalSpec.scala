package graft

import graft.operators.Multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing tests: schema shape, batched per-partition decode,
  * frame explosion, partition invariance (no shuffle-order dependence). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  test("synthetic media table has the canonical media schema") {
    val df = Multimodal.syntheticMediaTable(spark, sf)
    assert(df.columns.toSeq ==
      Seq("media_id", "format", "media", "width", "height", "n_frames"))
    assert(df.schema("media").dataType.typeName == "binary")
    val fmts = df.select("format").distinct().collect().map(_.getString(0)).toSet
    assert(fmts == Set("image", "audio", "video"))
  }

  test("ImageIO decodes a generated PNG bit-exactly (dims + pixel histogram)") {
    // expected features computed straight from the pixel formula, never
    // touching PNG bytes; the decode path must reproduce them exactly
    // after a full encode -> parse round trip
    val (id, w, h) = (7L, 5, 3)
    val hist = new Array[Float](Multimodal.FeatureDim)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = (((x + id) & 0xFF).toInt, ((y + 2 * id) & 0xFF).toInt, (x ^ y) & 0xFF)
      val lum = (r * 299 + g * 587 + b * 114) / 1000
      hist(lum * Multimodal.FeatureDim / 256) += 1f
    }
    val expected = hist.map(_ / (w * h).toFloat).toSeq
    val Some((dw, dh, feats)) = Multimodal.decodeImage(Multimodal.makePng(id, w, h))
    assert((dw, dh) == ((w, h)))
    assert(feats.toSeq == expected, s"got ${feats.toSeq} want $expected")
    // non-image bytes must degrade to None, not throw
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("image/audio rows decode to true geometry; stub formats report -1") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMediaTable(spark, sf))
      .collect()
    feats.foreach { r =>
      if (r.format == "image") {
        assert(r.width == (r.media_id % 64 + 16).toInt, s"media ${r.media_id}")
        assert(r.height == (r.media_id % 48 + 12).toInt, s"media ${r.media_id}")
      } else if (r.format == "audio") {
        assert(r.width == 8000, s"media ${r.media_id}: rate ${r.width}")
        assert(r.height == (r.media_id % 500 + 100).toInt, s"media ${r.media_id}")
      } else assert(r.width == -1 && r.height == -1, s"media ${r.media_id}")
    }
  }

  test("javax.sound decodes a generated WAV bit-exactly (rate, frames, sample histogram)") {
    // expected features straight from the sample formula, never touching
    // WAV bytes; decode must reproduce them after a full encode -> parse
    // round trip through the real RIFF container
    val (id, n) = (11L, 257)
    val m = (id % 13 + 3).toInt
    val hist = new Array[Float](Multimodal.FeatureDim)
    for (i <- 0 until n) {
      val base = (((id * 31 + i * 17) % 65536) - 32768).toInt
      val p = (i.toLong * m % n).toInt
      val tri = if (2 * p < n) 2 * p else 2 * (n - p)
      val s = base * (32 + 224 * tri / n) / 256
      hist((s + 32768) * Multimodal.FeatureDim / 65536) += 1f
    }
    val expected = hist.map(_ / n.toFloat).toSeq
    val Some((rate, frames, feats)) =
      Multimodal.decodeAudio(Multimodal.makeWav(id, n))
    assert((rate, frames) == ((8000, n)))
    assert(feats.toSeq == expected, s"got ${feats.toSeq} want $expected")
    // non-audio bytes degrade to None, not a throw
    assert(Multimodal.decodeAudio(Array[Byte](9, 9, 9, 9)).isEmpty)
    assert(Multimodal.decodeAudio(Multimodal.makePng(1L, 4, 4)).isEmpty)
  }

  test("resizePng: real decode -> rescale -> re-encode round trip") {
    val src = Multimodal.makePng(3L, 40, 30)
    val Some(resized) = Multimodal.resizePng(src, 24, 18)
    // the resized bytes are a REAL PNG that decodes to the target geometry
    val Some((w, h, feats)) = Multimodal.decodeImage(resized)
    assert((w, h) == ((24, 18)))
    assert(feats.length == Multimodal.FeatureDim)
    assert(math.abs(feats.map(_.toDouble).sum - 1.0) < 1e-5)
    // deterministic: same input -> byte-identical output
    assert(Multimodal.resizePng(src, 24, 18).get.toSeq == resized.toSeq)
    // non-image bytes degrade to None
    assert(Multimodal.resizePng(Array[Byte](5, 5, 5), 8, 8).isEmpty)
    // operator: image rows resized, others untouched
    val table = Multimodal.syntheticMediaTable(spark, sf)
    val out = Multimodal.resizeImages(table, 24, 18).collect()
    out.foreach { r =>
      if (r.format == "image") assert(r.width == 24 && r.height == 18)
    }
    val audioBefore = table.filter(org.apache.spark.sql.functions.col("format") === "audio")
      .selectExpr("sum(crc32(media))").head().getLong(0)
    val audioAfter = Multimodal.resizeImages(table, 24, 18).toDF()
      .filter(org.apache.spark.sql.functions.col("format") === "audio")
      .selectExpr("sum(crc32(media))").head().getLong(0)
    assert(audioBefore == audioAfter, "non-image bytes must pass through untouched")
  }

  test("dHash: stable under re-encode and half-size; distinct images far; pairs found") {
    val a = Multimodal.makePng(5L, 40, 30)
    val h = Multimodal.dhash64(a).get
    // byte-identical input -> identical hash; resize-to-same-dims
    // re-encode (different bytes) -> identical hash
    assert(Multimodal.dhash64(a).get == h)
    assert(Multimodal.dhash64(Multimodal.resizePng(a, 40, 30).get).get == h)
    // half-size thumbnail stays within the near-dup bound
    val half = Multimodal.dhash64(Multimodal.resizePngBy(a, 0.5).get).get
    assert(java.lang.Long.bitCount(h ^ half) <= 8,
      s"thumbnail drifted ${java.lang.Long.bitCount(h ^ half)} bits")
    // structurally different content is far (the FIXTURE formula is a
    // per-id constant shift — dHash's neighbor comparisons cancel it, so
    // same-dims fixture images hash identically; build a coarse
    // checkerboard for real structural difference)
    def checker(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        40, 30, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 30; x <- 0 until 40)
        img.setRGB(x, y, if (((x / 10) + (y / 10)) % 2 == 0) 0xFFFFFF else 0)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val otherBytes = checker()
    val other = Multimodal.dhash64(otherBytes).get
    assert(java.lang.Long.bitCount(h ^ other) > 8)
    assert(Multimodal.dhash64(Array[Byte](1, 2, 3)).isEmpty)
    // operator end-to-end: a planted thumbnail pair is found through the
    // Hamming blocking; the undecodable row drops out silently
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq(
      (1L, "image", a),
      (2L, "image", Multimodal.resizePngBy(a, 0.5).get),
      (3L, "image", otherBytes),
      (4L, "image", Array[Byte](9, 9))).toDF("media_id", "format", "media")
    val pairs = Multimodal.imageNearDupPairs(rows, "media_id", maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("audio envelope fingerprint: gain-invariant, decimation-stable, classes separate") {
    val wav = Multimodal.makeWav(7L, 400)
    val h = Multimodal.awash64(wav).get
    // attenuation preserves every envelope comparison exactly (gain-UP can
    // clip at Short.MaxValue, which distorts the envelope — by design)
    assert(Multimodal.awash64(Multimodal.scaleWav(wav, 0.5).get).get == h)
    assert(Multimodal.awash64(Multimodal.scaleWav(wav, 0.25).get).get == h)
    // halving the sample rate keeps the loudness SHAPE nearby
    val dec = Multimodal.awash64(Multimodal.decimateWav(wav, 2).get).get
    assert(java.lang.Long.bitCount(h ^ dec) <= 8,
      s"decimated drifted ${java.lang.Long.bitCount(h ^ dec)} bits")
    // a different AM class is far
    val other = Multimodal.awash64(Multimodal.makeWav(8L, 400)).get
    assert(java.lang.Long.bitCount(h ^ other) > 8)
    // too-short or non-audio bytes degrade to None
    assert(Multimodal.awash64(Multimodal.makeWav(7L, 50)).isEmpty)
    assert(Multimodal.awash64(Array[Byte](1, 2, 3)).isEmpty)
    // operator end-to-end: the planted volume twin is found; junk drops out
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq(
      (1L, "audio", wav),
      (2L, "audio", Multimodal.scaleWav(wav, 0.5).get),
      (3L, "audio", Multimodal.makeWav(8L, 400)),
      (4L, "audio", Array[Byte](9, 9))).toDF("media_id", "format", "media")
    val pairs = Multimodal.audioNearDupPairs(rows, "media_id", maxHamming = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("fingerprint kernel laws over random media (deterministic seeds)") {
    val rnd = new scala.util.Random(20260813)
    // image laws: decode recovers exact dims; dHash is deterministic and
    // EXACTLY invariant under a same-dims re-encode round trip
    for (_ <- 0 until 25) {
      val (id, w, h) = (rnd.nextLong(100000), 10 + rnd.nextInt(70), 9 + rnd.nextInt(50))
      val png = Multimodal.makePng(id, w, h)
      val Some((dw, dh, _)) = Multimodal.decodeImage(png)
      assert((dw, dh) == ((w, h)), s"dims for id=$id")
      val hh = Multimodal.dhash64(png).get
      assert(Multimodal.dhash64(png).get == hh, s"dHash nondeterministic id=$id")
      assert(Multimodal.dhash64(Multimodal.resizePng(png, w, h).get).get == hh,
        s"dHash not re-encode-invariant id=$id ${w}x$h")
    }
    // audio laws: decode recovers exact frame count; envelope hash is
    // deterministic and EXACTLY invariant under any attenuation in (0, 1]
    for (_ <- 0 until 25) {
      val (id, n) = (rnd.nextLong(100000), 80 + rnd.nextInt(500))
      val wav = Multimodal.makeWav(id, n)
      val Some((rate, frames, _)) = Multimodal.decodeAudio(wav)
      assert((rate, frames) == ((8000, n)), s"audio geometry id=$id")
      val hh = Multimodal.awash64(wav).get
      assert(Multimodal.awash64(wav).get == hh, s"awash nondeterministic id=$id")
      // exact equality holds for these FIXED seeds; in general int16
      // requantization can flip a near-tied window comparison, which is
      // why the q106 gate allows Hamming <= 4 rather than 0
      val gain = 0.1 + rnd.nextDouble() * 0.9
      assert(Multimodal.awash64(Multimodal.scaleWav(wav, gain).get).get == hh,
        s"awash not attenuation-invariant id=$id gain=$gain")
    }
    // corrupt bytes: every kernel degrades to None, never throws
    val junk = Array.fill(64)(rnd.nextInt(256).toByte)
    assert(Multimodal.dhash64(junk).isEmpty && Multimodal.awash64(junk).isEmpty &&
      Multimodal.resizePng(junk, 4, 4).isEmpty && Multimodal.decodeImage(junk).isEmpty &&
      Multimodal.decodeAudio(junk).isEmpty)
  }

  test("feature extraction: fixed dim, normalized, deterministic") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMediaTable(spark, sf))
    val rows = feats.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.features.length == Multimodal.FeatureDim))
    // stub histogram is L1-normalized
    assert(rows.forall(r => math.abs(r.features.map(_.toDouble).sum - 1.0) < 1e-5))
  }

  test("media fixture pins codec parallelism: AQE must not fold it to one partition") {
    import spark.implicits._
    val nPart = Multimodal.syntheticMediaTable(spark, sf)
      .select(org.apache.spark.sql.functions.spark_partition_id()).distinct().count()
    // the explicit-count repartition keys parallelism to cores even though
    // the shuffled metadata is tiny (AQE byte-based coalescing would pick 1)
    assert(nPart == spark.sparkContext.defaultParallelism.toLong,
      s"codec stage running on $nPart partition(s)")
  }

  test("feature extraction is partition-invariant") {
    val m = Multimodal.syntheticMediaTable(spark, sf)
    val a = Multimodal.extractFeatures(m.repartition(1), batchSize = 7)
      .collect().map(r => r.media_id -> r.features.toSeq).toMap
    val b = Multimodal.extractFeatures(m.repartition(13), batchSize = 64)
      .collect().map(r => r.media_id -> r.features.toSeq).toMap
    assert(a == b)
  }

  test("binaryFile ingestion maps raw media files into the media schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media")
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(dir.resolve(name), bytes)
    put("a.png", Array[Byte](1, 2, 3, 4))
    put("b.wav", Array[Byte](5, 6))
    put("c.mp4", Array[Byte](7, 8, 9))
    put("notes.txt", Array[Byte](99)) // must be glob-filtered out
    val df = Multimodal.loadMediaDir(spark, dir.toString)
    val rows = df.collect().map(r => r.getAs[String]("format") ->
      (r.getAs[Array[Byte]]("media").length, r.getAs[Long]("n_bytes"))).toMap
    assert(rows.keySet == Set("image", "audio", "video"))
    assert(rows("image") == ((4, 4L)) && rows("audio") == ((2, 2L)) &&
      rows("video") == ((3, 3L)))
    // the mapped frame pipeline runs on ingested rows too
    val feats = Multimodal.extractFeatures(df.select(
      "media_id", "format", "media"))
    assert(feats.count() == 3)
  }

  test("frame sampling explodes only video rows at the sample stride") {
    val m = Multimodal.syntheticMediaTable(spark, sf)
    val frames = Multimodal.sampleFrames(m, everyN = 6)
    val perDoc = frames.groupBy("media_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // only video (media_id % 3 == 2)
    assert(perDoc.keys.forall(_ % 3 == 2))
    // stride 6 over n_frames = id % 24 + 1 frames
    perDoc.foreach { case (id, n) =>
      val expected = (0 until (id % 24 + 1).toInt by 6).size
      assert(n == expected, s"media $id: $n frames, expected $expected")
    }
  }
}
