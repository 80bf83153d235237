package graft.tools

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway q143 (set similarity join) stage breakdown.
  * Usage: runMain graft.tools.Scratch4 [sfDir] */
object Scratch4 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]").appName("graft-scratch4")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch4] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val (tNum, tDen, shingleK) = (3, 5, 3)
    for (round <- 1 to 2) {
      println(s"[scratch4] === round $round ===")
      val docs = Tables.documents(spark, sfDir)
      val sets = time("sets checkpoint (tokenize+shingle explode)") {
        docs.select(col("doc_id").as("id"),
            explode(array_distinct(Dedup.shingles(
              TextAnalysis.tokens(col("text")), shingleK))).as("sh"))
          .localCheckpoint(true)
      }
      println(s"[scratch4] sets rows = ${sets.count()}")
      val sizes = sets.groupBy("id").agg(count(lit(1)).as("n"))
      val dfreq = sets.groupBy("sh").agg(count(lit(1)).as("df"))
      time("sizes+dfreq (noop)") {
        sizes.write.format("noop").mode("overwrite").save()
        dfreq.write.format("noop").mode("overwrite").save()
      }
      val wDoc = Window.partitionBy("id").orderBy(col("df"), col("sh"))
      val prefix = sets.join(dfreq, "sh").join(sizes, "id")
        .withColumn("r", row_number().over(wDoc))
        .filter(col("r") <= col("n") -
          expr(s"(n * $tNum + ${tDen - 1}) div $tDen") + 1)
        .select("id", "sh", "n")
      time("prefix build (joins+window, noop)") {
        prefix.write.format("noop").mode("overwrite").save()
      }
      val cands = prefix.as("a").join(prefix.as("b"),
          col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
        .filter(lit(tDen) * least(col("a.n"), col("b.n")) >=
          lit(tNum) * greatest(col("a.n"), col("b.n")))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.n").as("n_a"), col("b.n").as("n_b"))
        .distinct()
      println(s"[scratch4] cands rows = ${time("cands self-join (count)")(cands.count())}")
      val arrs = sets.groupBy("id").agg(collect_list(col("sh")).as("shs"))
      time("arrs repack (noop)") {
        arrs.write.format("noop").mode("overwrite").save()
      }
      time("full verify tail (noop)") {
        cands
          .join(arrs.select(col("id").as("id_a"), col("shs").as("shs_a")), "id_a")
          .join(arrs.select(col("id").as("id_b"), col("shs").as("shs_b")), "id_b")
          .withColumn("n_common",
            size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
          .filter(col("n_common") * tDen >=
            lit(tNum) * (col("n_a") + col("n_b") - col("n_common")))
          .write.format("noop").mode("overwrite").save()
      }
      time("full q143 (noop)") {
        Dedup.q143SetSimilarityJoin(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      graft.plans.Checkpoints.freeAll(spark)
    }
    spark.stop()
  }
}
