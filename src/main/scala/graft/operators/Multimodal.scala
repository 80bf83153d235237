package graft.operators

import graft.sources.Tables

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media is carried as an opaque `BINARY` column plus a typed metadata
  * struct — the layout a 100 TB training-data lake uses (media bytes inline
  * or as object-store pointers; metadata queryable without decoding). The
  * Spark-side plumbing — schema, partitioning, batched per-partition
  * processing, frame explosion — is real and tested; the codec itself is a
  * clearly marked deterministic STUB because no image/audio libraries exist
  * in this environment. Swapping `stubDecode` for a real decoder changes no
  * plan shape: it stays a per-partition, batch-at-a-time map with no shuffle.
  */
object Multimodal {

  val FeatureDim = 16
  val DefaultBatchSize = 64

  /** media_id, format, media(binary), width, height, n_frames. */
  case class MediaRow(media_id: Long, format: String, media: Array[Byte],
      width: Int, height: Int, n_frames: Int)

  case class MediaFeatures(media_id: Long, format: String,
      features: Array[Float], n_bytes: Long)

  /** Deterministic synthetic media table derived from `documents`: the text
    * bytes stand in for encoded media, with format/dimensions derived from
    * doc_id. Lets the plumbing be exercised on driver-provided data only. */
  def syntheticMediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"),
      encode(col("text"), "UTF-8").as("media"),
      (col("doc_id") % 640 + 64).cast("int").as("width"),
      (col("doc_id") % 480 + 48).cast("int").as("height"),
      (col("doc_id") % 24 + 1).cast("int").as("n_frames"))

  /** Real-world ingestion path: a directory of raw media files via Spark's
    * `binaryFile` source, mapped into the engine's media schema. Format is
    * derived from the file extension; dimensions stay unknown (-1) until the
    * decoder fills them — metadata-only columns (path, size) are queryable
    * without touching bytes. `pathGlobFilter` pushes the extension filter
    * into file listing, so a 100 TB lake scan never opens non-media files. */
  def loadMediaDir(spark: SparkSession, dir: String,
      glob: String = "*.{png,jpg,jpeg,wav,mp3,mp4,mkv}"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        element_at(split(col("path"), "\\."), -1).as("ext"),
        col("path"),
        col("length").as("n_bytes"),
        col("content").as("media"))
      .withColumn("format",
        when(col("ext").isin("png", "jpg", "jpeg"), "image")
          .when(col("ext").isin("wav", "mp3"), "audio")
          .otherwise("video"))
      .withColumn("width", lit(-1)).withColumn("height", lit(-1))
      .withColumn("n_frames", lit(1))
      .select("media_id", "format", "media", "width", "height", "n_frames", "path", "n_bytes")

  /** STUB decoder: a real build replaces this with an image/audio codec.
    * Deterministic: features are a folded byte histogram, normalized. The
    * signature — bytes in, fixed-dim float vector out — is the real one. */
  private def stubDecode(media: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](FeatureDim)
    var i = 0
    while (i < media.length) {
      acc(media(i) & (FeatureDim - 1)) += 1f
      i += 1
    }
    val n = math.max(media.length, 1).toFloat
    acc.map(_ / n)
  }

  /** Batched per-partition feature extraction. The batching (accumulate
    * `batchSize` rows, process together, emit) mirrors the arrow-batch shape
    * a vectorized decoder wants; no shuffle, no driver involvement. */
  def extractFeatures(media: DataFrame,
      batchSize: Int = DefaultBatchSize): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "format", "media").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real decoder would process the whole batch in one native call
          batch.iterator.map { case (id, fmt, bytes) =>
            MediaFeatures(id, fmt, stubDecode(bytes), bytes.length.toLong)
          }
        }
      }
  }

  /** Frame sampling for video rows: one output row per sampled frame index,
    * with a deterministic per-frame byte slice (STUB for frame extraction).
    * Explode happens in the engine (codegen'd), not in user code. */
  def sampleFrames(media: DataFrame, everyN: Int): DataFrame =
    media.filter(col("format") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))))
      .withColumn("frame_bytes",
        // STUB: slice of the media bytes stands in for a decoded frame
        expr(s"substring(media, CAST(frame_idx % 8 + 1 AS INT), 32)"))
      .select("media_id", "frame_idx", "frame_bytes", "width", "height")

  /** Metadata-level resize: plan-only transform (real resize happens in the
    * decoder at materialization time; the lake keeps declared target dims). */
  def declareResize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("target_width", lit(w)).withColumn("target_height", lit(h))

  // ---- declared queries (rows-only: stub decoder is engine-specific) ----

  /** Oracle-gated: media_id/format/n_bytes all pass through the batched
    * mapPartitions decode, so the plumbing (schema, batching, row fan-out)
    * is verified even though the stub feature VALUES are engine-specific
    * (those are covered by MultimodalSpec). A validity check on the feature
    * vector (fixed dim, L1-normalized) is folded in as a boolean. */
  def q60MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(syntheticMediaTable(spark, dir))
      .toDF()
      .select(col("media_id"), col("format"), col("n_bytes"),
        (size(col("features")) === FeatureDim &&
          abs(aggregate(col("features").cast("array<double>"), lit(0.0d),
            (acc, x) => acc + x) - 1.0d) < 0.001d).as("features_valid"))
      .orderBy("media_id")
  }

  def q61FrameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(syntheticMediaTable(spark, dir), everyN = 6)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame_bytes")).cast("long").as("n_frame_bytes"))
      .orderBy("media_id", "frame_idx")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_media_features" -> (q60MediaFeatures _),
    "q61_frame_sample" -> (q61FrameSample _))

  /** The stub feature values are engine-specific, but metadata and vector
    * validity are SQL-expressible, so both queries are oracle-gated. */
  val oracles: Map[String, String] = Map(
    "q60_media_features" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS format,
        |  CAST(LENGTH(text) AS BIGINT) AS n_bytes,
        |  LENGTH(text) > 0 AS features_valid
        |FROM documents ORDER BY media_id""".stripMargin,
    "q61_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(LENGTH(SUBSTRING(text, CAST(frame_idx % 8 + 1 AS INT), 32)) AS BIGINT) AS n_frame_bytes
        |FROM (SELECT doc_id, text, unnest(range(0, doc_id % 24 + 1, 6)) AS frame_idx
        |      FROM documents WHERE doc_id % 3 = 2)
        |ORDER BY media_id, frame_idx""".stripMargin)
}
