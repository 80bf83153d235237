package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway analysis main for round-3 design decisions (not part of the
  * library surface). Currently: row-count one declared query at one SF
  * (targeted gate triage without a full Verify pass).
  * Usage: runMain graft.tools.Scratch <queryName> <sfDir>
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]").appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(s"ROWS $name @ $sfDir = ${df.count()}")
    spark.stop()
  }
}
