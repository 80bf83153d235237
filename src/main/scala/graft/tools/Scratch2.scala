package graft.tools

import graft.GraftFunctions
import graft.GraftFunctions.{approx_distinct, sketch_estimate, sketch_merge_agg}
import graft.operators.SketchQueries
import graft.sources.Tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway q298 decomposition probe (not part of the library surface).
  * Times the estimate side (rowRangeSketchDistinct), the exact side
  * (trailingDistinctExact), and the estimate side's interior/edge branches
  * separately. Usage: runMain graft.tools.Scratch2 [sfDir] */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]").appName("graft-scratch2")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.length > 1)
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", args(1))
    println(s"[scratch2] fallbackThreshold = ${spark.conf.get("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")}")

    val ev = Tables.events(spark, sfDir)
    val rangeUs = 21600L * 1000000L
    val bucketUs = 3600L * 1000000L
    println(s"[scratch2] events rows = ${ev.count()}")
    println(s"[scratch2] instants = ${ev.select(col("event_type"), expr("unix_micros(ts)")).distinct().count()}")
    println(s"[scratch2] buckets = ${ev.select(col("event_type"), expr(s"unix_micros(ts) div $bucketUs")).distinct().count()}")

    def time(label: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[scratch2] $label run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        graft.plans.Checkpoints.freeAll(spark)
      }
    }

    time("est (rowRangeSketchDistinct)") {
      SketchQueries.rowRangeSketchDistinct(ev, "ts", "event_type", "user_id",
          rangeUs, bucketUs, algo = "lc", precision = 8192)
        .write.format("noop").mode("overwrite").save()
    }
    time("exact (trailingDistinctExact)") {
      SketchQueries.trailingDistinctExact(ev, "ts", "event_type", "user_id",
          rangeUs)
        .write.format("noop").mode("overwrite").save()
    }

    // interior / edge branches of the estimate side, inlined
    GraftFunctions.register(spark)
    val base = ev.select(col("event_type").as("k"),
        expr("unix_micros(ts)").as("us"), col("user_id").as("v"))
      .withColumn("bucket", expr(s"us div $bucketUs"))
    val perBucket = base.groupBy("k", "bucket")
      .agg(approx_distinct(col("v"), "lc", 8192).getField("binary").as("sk"))
    val inst = base.select("k", "us").distinct()
      .withColumn("s", col("us") - lit(rangeUs))
      .withColumn("b_lo", expr(s"s div $bucketUs"))
      .withColumn("b_hi", expr(s"us div $bucketUs"))
      .withColumn("bf_lo", expr(s"(s + $bucketUs - 1) div $bucketUs"))
      .withColumn("bf_hi", expr(s"(us + 1) div $bucketUs - 1"))
    time("interior (explode+join+merge)") {
      val interior = inst
        .filter(col("bf_lo") <= col("bf_hi"))
        .select(col("k"), col("us"),
          explode(sequence(col("bf_lo"), col("bf_hi"))).as("bucket"))
        .join(perBucket, Seq("k", "bucket"))
        .select("k", "us", "sk")
      interior.groupBy("k", "us")
        .agg(sketch_estimate(sketch_merge_agg(col("sk"))).as("est"))
        .write.format("noop").mode("overwrite").save()
    }
    time("edges (edge-bucket re-sketch)") {
      val edges = inst
        .select(col("k"), col("us"), col("s"),
          explode(array_distinct(filter(array(
            when(col("b_lo") < col("bf_lo") || col("bf_lo") > col("bf_hi"),
              col("b_lo")),
            when(col("b_hi") > col("bf_hi") || col("bf_lo") > col("bf_hi"),
              col("b_hi"))), x => x.isNotNull))).as("bucket"))
        .join(base.select(col("k"), col("bucket"), col("us").as("eus"),
          col("v")), Seq("k", "bucket"))
        .filter(col("eus") >= col("s") && col("eus") <= col("us"))
        .groupBy("k", "us")
        .agg(approx_distinct(col("v"), "lc", 8192)
          .getField("binary").as("sk"))
      edges.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
