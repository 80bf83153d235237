package graft

import graft.operators.Similarity
import graft.sources.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted-IVF contract: the inverted lists land partitioned by
  * (batch_id, cid), a probe reads ONLY the probed partitions — asserted
  * from the executed scan's own numFiles metric against the files on disk,
  * not just plan text — and ingest batches append against the stored
  * centroids without touching existing lists. */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  /** All file-source scans in the executed plan, descending through AQE
    * wrappers (query stages hide their subtree from `children`). */
  private def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => fileScans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(fileScans)
  }

  private def parquetFilesUnder(dir: java.io.File): Seq[String] = {
    val here = Option(dir.listFiles()).getOrElse(Array.empty)
    here.filter(_.isFile).map(_.getPath).filter(_.endsWith(".parquet")).toSeq ++
      here.filter(_.isDirectory).flatMap(parquetFilesUnder)
  }

  test("persisted IVF probe is partition-pruned to nProbe inverted lists and stays accurate") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val nCentroids = 8
    val nProbe = 3
    Similarity.ivfBuildIndex(emb, "vec_id", "embedding", dir,
      nCentroids = nCentroids, iters = 2)

    // the store is one directory per centroid under the base batch
    val batch0 = new java.io.File(s"$dir/lists/batch_id=0")
    val listDirs = batch0.listFiles().map(_.getName).filter(_.startsWith("cid=")).toSeq
    assert(listDirs.size == nCentroids, s"inverted-list dirs: $listDirs")

    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val probes = Similarity.ivfProbeCids(spark, dir, qv, nProbe)
    assert(probes.size == nProbe)

    // plan-level: a NON-EMPTY partition filter on cid (an empty
    // "PartitionFilters: []" must not pass)
    val res = Similarity.ivfQueryTopK(spark, dir, qv, 5, nProbe)
    res.collect()
    val plan = res.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(plan).isDefined,
      s"no non-empty cid partition filter:\n$plan")

    // runtime-level: the scan's own numFiles metric equals the file count
    // of the probed partitions, and is strictly less than the whole store
    val scans = fileScans(res.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("lists")))
    assert(scans.nonEmpty, "no lists scan in the executed plan")
    val scanned = scans.map(_.metrics("numFiles").value).sum
    val probedFiles = probes.map(c =>
      parquetFilesUnder(new java.io.File(s"$dir/lists/batch_id=0/cid=$c")).size).sum
    val allFiles = parquetFilesUnder(new java.io.File(s"$dir/lists")).size
    assert(scanned == probedFiles,
      s"scan touched $scanned files, probed partitions hold $probedFiles")
    assert(scanned < allFiles,
      s"scan touched all $allFiles files - no pruning happened")

    // and the answer is still an ANN answer: 5 results, >= 3 in the true top-5
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 5)
      .select("id")
    val ids = res.select("id")
    assert(ids.count() == 5L)
    assert(ids.join(brute, Seq("id"), "left_semi").count() >= 3L)
  }

  test("IVF-PQ: probe is partition-pruned AND code-only; append replays idempotently") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    Similarity.ivfPqBuildIndex(emb, "vec_id", "embedding", dir, dim = 64,
      nCentroids = 8, m = 8, ksub = 16)

    // the codes store carries PQ codes, never the raw vectors
    val codesSchema = spark.read.parquet(s"$dir/codes").schema
    assert(codesSchema.fieldNames.toSet == Set("id", "codes", "batch_id", "cid"),
      s"unexpected codes schema: ${codesSchema.treeString}")

    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val nProbe = 3
    val res = Similarity.ivfPqQueryTopK(spark, dir, emb, "vec_id",
      "embedding", qv, 5, nProbe = nProbe, rerank = 48)
    res.collect()

    // pruned: the codes scan touches exactly the probed cid partitions
    val probes = Similarity.ivfProbeCids(spark, dir, qv, nProbe)
    val scans = fileScans(res.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("codes")))
    assert(scans.nonEmpty, "no codes scan in the executed plan")
    val scanned = scans.map(_.metrics("numFiles").value).sum
    val probedFiles = probes.map(c =>
      parquetFilesUnder(new java.io.File(s"$dir/codes/batch_id=0/cid=$c")).size).sum
    val allFiles = parquetFilesUnder(new java.io.File(s"$dir/codes")).size
    assert(scanned == probedFiles && scanned < allFiles,
      s"scan touched $scanned files; probed=$probedFiles all=$allFiles")

    // the query vector's own id survives the coarse probe + ADC shortlist
    // + rerank chain at rank 1 (its own cid is always the top probe)
    val got = res.as[(Long, Long)].collect().toMap
    assert(got(0L) == 1L, s"query not at rank 1: $got")

    // append replay: same batch id twice -> no duplicate codes
    val batch = emb.filter(col("vec_id").between(1L, 20L))
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
    val base = spark.read.parquet(s"$dir/codes").count()
    Similarity.ivfPqAppendBatch(batch, "vec_id", "embedding", dir, batchId = 1L)
    Similarity.ivfPqAppendBatch(batch, "vec_id", "embedding", dir, batchId = 1L)
    assert(spark.read.parquet(s"$dir/codes").count() == base + 20L,
      "replayed IVF-PQ append duplicated codes")
  }

  test("ivfAppendBatch: new batch lands in the stored layout, probes find it pruned, replay is idempotent") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString
    Similarity.ivfBuildIndex(emb, "vec_id", "embedding", dir,
      nCentroids = 8, iters = 2)
    val baseCount = spark.read.parquet(s"$dir/lists").count()

    // the ingest batch: vec_id 0's vector re-appears under a planted id —
    // identical embedding, so it must assign to vec_id 0's own centroid and
    // rank at the top of vec_id 0's probe
    val plantedId = 900000L
    val batch = emb.filter(col("vec_id") === 0L)
      .select(lit(plantedId).as("vec_id"), col("embedding"))
      .union(emb.filter(col("vec_id").between(1L, 20L))
        .select((col("vec_id") + 900000L).as("vec_id"), col("embedding")))
    Similarity.ivfAppendBatch(batch, "vec_id", "embedding", dir, batchId = 1L)

    assert(spark.read.parquet(s"$dir/lists").count() == baseCount + 21L)
    // existing lists untouched: batch 0 files still hold exactly the corpus
    assert(spark.read.parquet(s"$dir/lists").filter(col("batch_id") === 0L).count()
      == baseCount)

    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val res = Similarity.ivfQueryTopK(spark, dir, qv, 5, nProbe = 3)
    res.collect()
    // the probe read stays pruned with the appended batch in place
    val scans = fileScans(res.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("lists")))
    assert(scans.nonEmpty, "no lists scan in the executed plan")
    val scanned = scans.map(_.metrics("numFiles").value).sum
    val allFiles = parquetFilesUnder(new java.io.File(s"$dir/lists")).size
    assert(scanned < allFiles, s"probe read all $allFiles files after append")
    // ... and finds the planted twin of the query vector through it
    val top = res.select("id").as[Long].collect().toSeq
    assert(top.contains(plantedId),
      s"planted vector from the appended batch missing from top-5: $top")

    // replaying the SAME batch id must not duplicate vectors
    Similarity.ivfAppendBatch(batch, "vec_id", "embedding", dir, batchId = 1L)
    assert(spark.read.parquet(s"$dir/lists").count() == baseCount + 21L,
      "replayed batch duplicated vectors")

    // batch_id 0 is reserved for the base build
    intercept[IllegalArgumentException](
      Similarity.ivfAppendBatch(batch, "vec_id", "embedding", dir, batchId = 0L))
  }
}
