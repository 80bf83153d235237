package graft

import graft.operators.Ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, BroadcastQueryStageExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-10 trainer-stability fixes (VERDICT r9 items
  * 1–3): the ALS half-step must broadcast the model-sized factor frame
  * (post-checkpoint it has no stats, so an unhinted plan can degrade to a
  * sort-merge join that reshuffles the ratings fact every half-step —
  * the 20.7× driver-run regression), and the grid-DBSCAN neighborhood
  * must be the 9-offset equi-join, never a BroadcastNestedLoopJoin. */
class TrainerPlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  private def collectPlans(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: collectPlans(a.executedPlan)
    case q: QueryStageExec => p +: collectPlans(q.plan)
    case _ => p +: (p.children ++ p.subqueries).flatMap(collectPlans)
  }

  private def executedPlans(df: DataFrame): Seq[SparkPlan] = {
    df.collect() // force AQE so the final physical plan is the real one
    collectPlans(df.queryExecution.executedPlan)
  }

  private def alsHalfStepFrame(): DataFrame = {
    import spark.implicits._
    val rt = (1 to 500)
      .map(i => ((i % 50).toLong, (i % 37).toLong, (i % 7 + 1).toLong))
      .toDF("u", "i", "r").localCheckpoint(true)
    val f = (0 until 37)
      .map(i => (i.toLong, 1.0, ((i % 97) - 48).toDouble / 97.0))
      .toDF("i", "f1", "f2").localCheckpoint(true)
    Ml.alsHalfStep(rt, "u", "i", f, 0.125)
  }

  test("ALS half-step carries an explicit BROADCAST hint on the factor frame") {
    // static pin — independent of AQE's runtime size-based rescue, so it
    // fails on the unhinted HEAD~1 shape even at test scale
    val joins = alsHalfStepFrame().queryExecution.optimizedPlan
      .collect { case j: Join => j }
    assert(joins.nonEmpty, "half-step lost its join?")
    assert(joins.exists(j =>
      j.hint.leftHint.exists(_.strategy.contains(BROADCAST)) ||
        j.hint.rightHint.exists(_.strategy.contains(BROADCAST))),
      "factor-frame join has no broadcast hint — post-checkpoint stats " +
        "are unknown and the planner may sort-merge the ratings fact")
  }

  test("ALS half-step plans one BroadcastHashJoin and at most one shuffle") {
    val plans = executedPlans(alsHalfStepFrame())
    assert(plans.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "half-step factor join is not a BroadcastHashJoin")
    assert(!plans.exists(_.isInstanceOf[SortMergeJoinExec]),
      "half-step reshuffles the ratings fact through a SortMergeJoin")
    val shuffles = plans.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles <= 1,
      s"half-step has $shuffles shuffles; only the groupBy may shuffle")
  }

  test("q336/q339 end-to-end stay green with the hinted half-step") {
    for (q <- Seq("q336_als_factors", "q339_als_recommend")) {
      val rows = SparkEntry.queries(q)(spark, sf).collect()
      assert(rows.nonEmpty, s"$q returned no rows")
    }
  }

  test("q400 hubness broadcasts the PROBE PANEL, never the corpus") {
    // the funnel's scale contract: the corpus streams, the fixed-size
    // panel broadcasts. If a refactor flipped the crossJoin sides the
    // plan would still be "a BNLJ" — only the build-side row count
    // distinguishes panel-broadcast from corpus-broadcast, so pin it
    // with runtime stats (the q366 pattern).
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val corpus = emb.count()
    val panel = emb.filter(col("vec_id") % 1000 === 0).count()
    assert(panel > 0 && panel < corpus, "fixture no longer discriminates")
    val df = SparkEntry.queries("q400_hubness_audit")(spark, sf)
    val bnlj = executedPlans(df).collect {
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(bnlj.nonEmpty, "q400 lost its broadcast cross join")
    for (b <- bnlj) {
      val build = b.buildSide match {
        case BuildLeft => b.left
        case BuildRight => b.right
      }
      val rows = collectPlans(build)
        .collectFirst { case s: BroadcastQueryStageExec => s }
        .flatMap(_.getRuntimeStatistics.rowCount).toSeq
      assert(rows.nonEmpty && rows.forall(_ == panel),
        s"q400 BNLJ build side has rows=${rows.mkString(",")}, expected " +
          s"the $panel-row probe panel (corpus=$corpus):\n" +
          b.simpleStringWithNodeId())
    }
  }

  test("grid-DBSCAN q366 plans no data-scaled BroadcastNestedLoopJoin") {
    // a BNLJ is tolerable ONLY when its build side is a 1-row statistic
    // frame (the `crossJoin(broadcast(tot))` threshold pattern) — the
    // O(cells²) neighborhood self-join r9 flagged broadcast the whole
    // data-scaled cell frame, which this pin rejects via runtime stats
    val df = SparkEntry.queries("q366_grid_dbscan")(spark, sf)
    val bnlj = executedPlans(df).collect {
      case b: BroadcastNestedLoopJoinExec => b
    }
    for (b <- bnlj) {
      val build = b.buildSide match {
        case BuildLeft => b.left
        case BuildRight => b.right
      }
      // only the OUTERMOST broadcast stage on the build side is this
      // BNLJ's build — deeper stages belong to nested (equi) joins
      val rows = collectPlans(build)
        .collectFirst { case s: BroadcastQueryStageExec => s }
        .flatMap(_.getRuntimeStatistics.rowCount).toSeq
      assert(rows.nonEmpty && rows.forall(_ <= 1),
        "q366 has a BNLJ with a data-scaled build side " +
          s"(rows=${rows.mkString(",")}) — the 3×3 neighborhood must be " +
          "the 9-offset equi-join, O(cells), not the O(cells²) non-equi " +
          "self-join:\n" + b.simpleStringWithNodeId())
    }
  }
}
