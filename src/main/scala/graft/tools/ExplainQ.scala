package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.tail) {
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(spark, args(0)).explain("formatted")
    }
    spark.stop()
  }
}
