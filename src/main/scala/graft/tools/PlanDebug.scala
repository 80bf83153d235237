package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev aid: dump the optimized logical plan of a rollup over a scan —
  * node classes, Expand projections, aggregate expression trees. */
object PlanDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val df = li.rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("s"),
        min(col("l_discount")).as("mn"))
    val p = df.queryExecution.optimizedPlan
    println("=== treeString ===")
    println(p.treeString)
    p.foreach {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand =>
        println("=== Expand output ===")
        e.output.foreach(a => println(s"  ${a.name}#${a.exprId.id}: ${a.dataType}"))
        println("=== Expand projections ===")
        e.projections.foreach(pr => println("  " + pr.map(x =>
          s"[${x.getClass.getSimpleName}] $x").mkString(" | ")))
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        println("=== Aggregate groupings ===")
        a.groupingExpressions.foreach(g => println(s"  [${g.getClass.getSimpleName}] $g"))
        println("=== Aggregate aggExprs ===")
        a.aggregateExpressions.foreach(x => println(s"  [${x.getClass.getSimpleName}] $x"))
      case _ =>
    }
    spark.stop()
  }
}
