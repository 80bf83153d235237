package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway analysis main (not part of the library surface). Current
  * drive: streamingPackIngest over a REAL file-source stream of the
  * documents table, checked against one-shot packSequences of the same
  * corpus.
  * Usage: runMain graft.tools.Scratch <sfDir>
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]").appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-drive-pack").toString
    val src = s"$out/src"
    // land the corpus as files, then ingest them through a real
    // file-source stream (one batch per file trigger here)
    docs.repartition(1).write.parquet(src)
    val stream = spark.readStream.schema(docs.schema).parquet(src)
    val q = graft.streaming.StreamOps.streamingPackIngest(stream, "doc_id",
      "text", "lang", budget = 256L, nShards = 8, s"$out/pack")
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(s"$out/pack/packed")
      .select("stream", "shard", "doc_id", "tok_start", "seq_first", "seq_last")
    val oneShot = graft.operators.TextAnalysis.packSequences(docs, "doc_id",
        "text", "lang", budget = 256L, nShards = 8)
      .select("stream", "shard", "doc_id", "tok_start", "seq_first", "seq_last")
    val nGot = got.count()
    val diff = got.exceptAll(oneShot).count() + oneShot.exceptAll(got).count()
    println(s"SCRATCH packed_rows=$nGot one_shot_rows=${oneShot.count()} sym_diff=$diff")
    println(s"SCRATCH offsets=" + spark.read.parquet(s"$out/pack/offsets")
      .groupBy("stream").agg(sum("n_tokens_batch")).collect().toSeq)
    spark.stop()
  }
}
