package graft.tools

import graft.operators.{Basket, Graph}
import graft.sources.Tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway q264 decomposition probe. Usage: runMain graft.tools.Scratch3 [sfDir] */
object Scratch3 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]").appName("graft-scratch3")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch3] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    for (round <- 1 to 2) {
      println(s"[scratch3] === round $round ===")
      val bk = Basket.baskets(Tables.lineitem(spark, sfDir), "l_orderkey",
        "l_partkey", basketCap = 64)
      val edges = Basket.pairCounts(bk, basketCap = 64, minSupport = 1L)
      val bi = time("bi build (union+distinct+checkpoint)") {
        edges.select(col("p1").as("u"), col("p2").as("v"))
          .filter(col("u") =!= col("v"))
          .union(edges.select(col("p2").as("u"), col("p1").as("v")))
          .distinct()
          .localCheckpoint(true)
      }
      println(s"[scratch3] bi rows = ${bi.count()}")
      val probes = Tables.part(spark, sfDir)
        .filter(col("p_partkey") % 100 === 0).select("p_partkey")
      val deg = bi.groupBy(col("u").as("node")).agg(count(lit(1)).as("d"))
      time("deg (noop)") {
        deg.write.format("noop").mode("overwrite").save()
      }
      val probeEdges = bi.join(
        probes.select(col(probes.columns.head).as("u")), Seq("u"), "left_semi")
      val probeHop = probeEdges
        .join(deg.withColumnRenamed("node", "v"), Seq("v"))
        .filter(col("d") <= 1024L)
        .select(col("u"), col("v").as("w"),
          (lit(1.0) / log(col("d").cast("double"))).cast("decimal(38,15)").as("term"))
      time("probeHop (noop)") {
        probeHop.write.format("noop").mode("overwrite").save()
      }
      val twoHop = probeHop
        .join(bi.select(col("u").as("w"), col("v").as("cand")), Seq("w"))
        .filter(col("cand") =!= col("u"))
      time("twoHop join (noop)") {
        twoHop.write.format("noop").mode("overwrite").save()
      }
      println(s"[scratch3] twoHop rows = ${time("twoHop count")(twoHop.count())}")
      val scored = twoHop.groupBy(col("u"), col("cand").as("v"))
        .agg(count(lit(1)).as("n_common"),
          sum("term").cast("decimal(38,15)").as("aa"))
        .join(probeEdges, Seq("u", "v"), "left_anti")
      time("scored agg+anti (noop)") {
        scored.write.format("noop").mode("overwrite").save()
      }
      // decimal-cost probes (NOT semantics-preserving; timing only)
      val probeHopD = probeEdges
        .join(deg.withColumnRenamed("node", "v"), Seq("v"))
        .filter(col("d") <= 1024L)
        .select(col("u"), col("v").as("w"), col("d"))
      val twoHopD = probeHopD
        .join(bi.select(col("u").as("w"), col("v").as("cand")), Seq("w"))
        .filter(col("cand") =!= col("u"))
      time("PROBE twoHop-with-long-d (noop)") {
        twoHopD.write.format("noop").mode("overwrite").save()
      }
      time("PROBE scored-double-sum (noop)") {
        twoHopD.withColumn("term", lit(1.0) / log(col("d").cast("double")))
          .groupBy(col("u"), col("cand").as("v"))
          .agg(count(lit(1)).as("n_common"), sum("term").as("aa"))
          .join(probeEdges, Seq("u", "v"), "left_anti")
          .write.format("noop").mode("overwrite").save()
      }
      time("PROBE scored-cells-then-decimal (noop)") {
        twoHopD
          .groupBy(col("u"), col("cand").as("v"), col("d"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("aa_part", col("cnt").cast("decimal(20,0)") *
            (lit(1.0) / log(col("d").cast("double"))).cast("decimal(38,15)"))
          .groupBy("u", "v")
          .agg(sum(col("cnt")).as("n_common"),
            sum(col("aa_part")).cast("decimal(38,15)").as("aa"))
          .join(probeEdges, Seq("u", "v"), "left_anti")
          .write.format("noop").mode("overwrite").save()
      }
      time("full q264 (noop)") {
        Graph.q264AdamicAdar(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      graft.plans.Checkpoints.freeAll(spark)
    }
    spark.stop()
  }
}
