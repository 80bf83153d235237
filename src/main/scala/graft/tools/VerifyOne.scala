package graft.tools

import org.apache.spark.sql.SparkSession

/** Targeted correctness dump: parquet-dump SELECTED declared queries (plus
  * their oracle SQL as text files) so a single new query can be
  * DuckDB-compared without a full Verify pass.
  * Usage: runMain graft.tools.VerifyOne <sfDir> <outDir> <q1> [q2 ...]
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-verify-one")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.Verify.hashableOutput(graft.SparkEntry.queries(name)(spark, sfDir))
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      graft.SparkEntry.oracleSql.get(name).foreach { sql =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$name.sql"), sql)
      }
      println(s"[verify-one] dumped $name")
    }
    spark.stop()
  }
}
