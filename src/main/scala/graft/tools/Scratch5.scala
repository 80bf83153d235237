package graft.tools

import graft.operators.{Buckets, Dedup}
import graft.sources.Tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway q158 (semDedup) stage breakdown.
  * Usage: runMain graft.tools.Scratch5 [sfDir] */
object Scratch5 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]").appName("graft-scratch5")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch5] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    for (round <- 1 to 2) {
      println(s"[scratch5] === round $round ===")
      val emb = Tables.embeddings(spark, sfDir)
      val base = emb.select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("v"))
      println(s"[scratch5] rows = ${base.count()}, dim = ${base.select(size(col("v"))).head().getInt(0)}")
      // mirror semDedup internals
      val simMethods = graft.operators.Similarity.getClass.getDeclaredMethod(
        "ivfTrain", classOf[org.apache.spark.sql.DataFrame],
        classOf[Int], classOf[Int], classOf[Int])
      simMethods.setAccessible(true)
      val model = time("ivfTrain (16c, 3 iters, 2048 sample)") {
        simMethods.invoke(graft.operators.Similarity, base,
          Integer.valueOf(16), Integer.valueOf(3), Integer.valueOf(2048))
          .asInstanceOf[Array[(Long, Array[Double])]]
      }
      val topN = graft.operators.Similarity.getClass.getDeclaredMethod(
        "ivfAssignTopNCol", classOf[Array[(Long, Array[Double])]], classOf[Int])
      topN.setAccessible(true)
      val cidsCol = topN.invoke(graft.operators.Similarity, model,
        Integer.valueOf(2)).asInstanceOf[org.apache.spark.sql.Column]
      val assigned = time("assigned checkpoint") {
        base.withColumn("cids", cidsCol)
          .withColumn("cid", col("cids").getItem(0))
          .localCheckpoint(true)
      }
      val pairs = Buckets.candidatePairs(
          assigned.select(col("id"), explode(col("cids")).as("cid")),
          Seq("cid"), "id", 256, "semdedup_bucket_cap")
        .join(assigned.select(col("id").as("id_a"), col("v").as("va")), "id_a")
        .join(assigned.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
        .filter(graft.GraftFunctions.cosine_similarity(col("va"), col("vb")) >= 0.4)
        .select("id_a", "id_b")
      println(s"[scratch5] pairs = ${time("pairs count")(pairs.count())}")
      val comps = time("connectedComponents (full)") {
        Dedup.connectedComponents(pairs)
      }
      println(s"[scratch5] comps = ${comps.count()}")
      graft.plans.Checkpoints.freeAll(spark)
    }
    spark.stop()
  }
}
