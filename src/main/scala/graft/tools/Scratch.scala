package graft.tools

import graft.GraftFunctions
import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway analysis main for round-3 design decisions (not part of the
  * library surface). Currently: SimHash Hamming distance vs exact 3-shingle
  * Jaccard over all doc pairs, to pick an oracle-gateable q46 threshold.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]").appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    val docs = Tables.documents(spark, sfDir)
    val d = docs.select(col("doc_id"),
      array_distinct(Dedup.shingles(TextAnalysis.tokens(col("text")), 3)).as("sh"),
      GraftFunctions.simhash(TextAnalysis.tokens(col("text"))).as("sim"))
      .cache()
    println(s"docs: ${d.count()}")

    val pairs = d.as("x").join(d.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        (size(array_intersect(col("x.sh"), col("y.sh"))).cast("double") /
          size(array_union(col("x.sh"), col("y.sh"))).cast("double")).as("j"),
        bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).as("ham"))
      .cache()

    // distribution: for each jaccard bucket, hamming stats
    pairs.filter(col("j") >= 0.3)
      .groupBy(floor(col("j") * 20) / 20 as "j_bucket")
      .agg(count(lit(1)).as("n"), min("ham").as("min_ham"),
        expr("percentile(ham, 0.5)").as("med_ham"), max("ham").as("max_ham"))
      .orderBy(desc("j_bucket"))
      .show(30, false)

    // candidate thresholds: max hamming among pairs with j >= t
    for (t <- Seq(0.8, 0.9, 0.95, 0.99, 1.0)) {
      val r = pairs.filter(col("j") >= t)
        .agg(count(lit(1)).as("n"), max("ham").as("max_ham")).collect()(0)
      println(s"j >= $t : n=${r.getLong(0)} max_ham=${if (r.isNullAt(1)) "-" else r.get(1)}")
    }
    spark.stop()
  }
}
