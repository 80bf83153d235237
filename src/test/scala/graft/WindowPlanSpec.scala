package graft

import graft.operators.Rank

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-9 rank-algebra rewrites: the rank/ntile/cumsum
  * operators must contain NO single-partition WindowExec (an unpartitioned
  * `Window.orderBy` moves the whole input into one task — the silent
  * scale-killer VERDICT r8 flagged in q284/q224/q175/q186), plus value
  * equivalence of [[Rank.globalRankPrefix]]/[[Rank.ntileFromRank]] against
  * the single-partition built-ins they replace. */
class WindowPlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  private def collectPlans(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: collectPlans(a.executedPlan)
    case _ => p +: (p.children ++ p.subqueries).flatMap(collectPlans)
  }

  private def unpartitionedWindows(df: DataFrame): Seq[WindowExec] = {
    df.collect() // force AQE so the final physical plan is the real one
    collectPlans(df.queryExecution.executedPlan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
  }

  test("rank-algebra queries plan zero single-partition windows") {
    for (q <- Seq("q284_kruskal_wallis", "q224_mann_whitney", "q175_rfm",
        "q186_abc_classes", "q283_lorenz_curve", "q290_moods_median")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val bad = unpartitionedWindows(df)
      assert(bad.isEmpty,
        s"$q has ${bad.size} single-partition WindowExec node(s):\n" +
          bad.map(_.simpleStringWithNodeId()).mkString("\n"))
    }
  }

  test("globalRankPrefix equals global row_number + running sum") {
    import spark.implicits._
    val df = (1 to 997).map(i => ((i * 7919) % 1000, i.toLong))
      .toDF("k", "w")
    val got = Rank.globalRankPrefix(df, Seq(col("k"), col("w")),
        Seq("cw" -> col("w")))
      .select("k", "w", "__rn", "cw").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val w = Window.orderBy(col("k"), col("w"))
    val exp = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cw", sum(col("w")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "w", "rn", "cw").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.sameElements(exp))
  }

  test("ntileFromRank matches Spark ntile for every n and k") {
    import spark.implicits._
    for (n <- Seq(1, 4, 5, 23, 100); k <- Seq(2, 5, 7)) {
      val df = (1 to n).map(_.toLong).toDF("rn")
        .withColumn("__n", lit(n.toLong))
      val got = df.withColumn("t", Rank.ntileFromRank("rn", "__n", k))
        .select("rn", "t").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      val exp = (1 to n).map(_.toLong).toDF("v")
        .withColumn("t", ntile(k).over(Window.orderBy("v")))
        .select("v", "t").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      assert(got.sameElements(exp), s"ntile mismatch at n=$n k=$k")
    }
  }
}
