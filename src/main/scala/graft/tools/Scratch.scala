package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway analysis main (not part of the library surface). Current
  * experiment: PQ shortlist (rerank) size vs exact-top-5 recall at one SF,
  * to size the auto-rerank formula.
  * Usage: runMain graft.tools.Scratch <sfDir> <rerank1> [rerank2 ...]
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reranks = args.tail.map(_.toInt)
    val spark = SparkSession.builder().master("local[32]").appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val brute = graft.operators.Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", 0L, 5)
      .select("id").collect().map(_.getLong(0)).toSet
    for (r <- reranks) {
      val pq = graft.operators.Similarity
        .pqTopK(emb, "vec_id", "embedding", 64, 0L, 5, rerank = r)
        .select("id").collect().map(_.getLong(0)).toSet
      println(s"SCRATCH n=$n rerank=$r hits=${pq.count(brute.contains)}/5")
    }
    spark.stop()
  }
}
