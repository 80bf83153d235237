package graft

import graft.GraftFunctions
import graft.operators.Mv
import graft.sources.Tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the MV aggregate rewrite (q147): the rule must fire — and
  * produce bit-identical results — exactly when the aggregate is answerable
  * from the summary, and must leave every other shape scanning the fact
  * table. */
class MvRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"
  // one registration for the whole spec; the rule is scoped to this tmp
  // fact path, so the rest of the test JVM is untouched
  lazy val installed: (String, DataFrame, String) =
    Mv.installLineitemMv(spark, sfDir)

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q147 shape is answered from the MV scan, bit-equal to the fact scan") {
    val (_, base, _) = installed
    val viaMv = Mv.q147Shape(base)
    val plan = planOf(viaMv)
    assert(plan.contains("mv_lineitem_rfls"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("fact_lineitem.parquet"))
    val raw = Mv.q147Shape(Tables.lineitem(spark, sfDir))
    assert(viaMv.collect().toSeq == raw.collect().toSeq)
  }

  test("average rewrites to sum-of-sums / sum-of-counts") {
    val (_, base, _) = installed
    def shape(df: DataFrame): DataFrame =
      df.groupBy("l_returnflag")
        .agg(avg(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("avg_qty"))
        .orderBy("l_returnflag")
    val viaMv = shape(base)
    assert(planOf(viaMv).contains("mv_lineitem_rfls"))
    val got = viaMv.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = shape(Tables.lineitem(spark, sfDir)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    // Average rounds once to scale 6, the rewrite's divide twice (quotient
    // scale, then 6) — equal in practice, pinned to half an ulp of scale 6
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) <= 5e-7, k) }
  }

  test("no grouping keys: full-table totals still rewrite") {
    val (_, base, _) = installed
    val viaMv = base.agg(count(lit(1)).as("n"),
      sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("s"))
    assert(planOf(viaMv).contains("mv_lineitem_rfls"))
    val raw = Tables.lineitem(spark, sfDir).agg(count(lit(1)).as("n"),
      sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("s"))
    assert(viaMv.collect().toSeq == raw.collect().toSeq)
  }

  test("non-answerable shapes keep scanning the fact table") {
    val (_, base, _) = installed
    // filter on a measure — the MV has no row-level quantities
    assert(planOf(base.filter(col("l_quantity") > 30)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n")))
      .contains("fact_lineitem.parquet"))
    // distinct aggregate — not derivable from (cnt, sums)
    assert(planOf(base.groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("d")))
      .contains("fact_lineitem.parquet"))
    // grouping key outside the MV dims
    assert(planOf(base.groupBy("l_shipdate").agg(count(lit(1)).as("n")))
      .contains("fact_lineitem.parquet"))
    // measure shape mismatch: bare double sum vs the MV's decimal-cast sums
    assert(planOf(base.groupBy("l_returnflag")
        .agg(sum(col("l_quantity")).as("s")))
      .contains("fact_lineitem.parquet"))
  }

  test("rollup (grouping sets) is answered from the MV, bit-equal") {
    val (_, base, _) = installed
    val viaMv = Mv.q160Shape(base)
    val plan = planOf(viaMv)
    assert(plan.contains("mv_lineitem_rfls"), s"rollup rewrite did not fire:\n$plan")
    assert(!plan.contains("fact_lineitem.parquet"))
    assert(plan.contains("Expand"), "grouping-sets structure must survive")
    val raw = Mv.q160Shape(Tables.lineitem(spark, sfDir))
    assert(viaMv.collect().toSeq == raw.collect().toSeq)
  }

  test("cube with a dim filter is answered from the MV, bit-equal") {
    val (_, base, _) = installed
    def shape(df: DataFrame): DataFrame =
      df.filter(col("l_linestatus") === "F")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("s"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))
    val viaMv = shape(base)
    assert(planOf(viaMv).contains("mv_lineitem_rfls"))
    assert(viaMv.collect().toSeq
      == shape(Tables.lineitem(spark, sfDir)).collect().toSeq)
  }

  test("approx_distinct rewrites to a merge of the MV's stored sketches, bit-exact") {
    val (_, base, _) = installed
    def shape(df: DataFrame): DataFrame =
      df.groupBy("l_returnflag")
        .agg(GraftFunctions.approx_distinct(col("l_orderkey"))
          .getField("cardinality").as("est"))
        .orderBy("l_returnflag")
    val viaMv = shape(base)
    assert(planOf(viaMv).contains("mv_lineitem_rfls"),
      "sketch pushdown did not fire")
    // merge associativity: the merged-partials estimate must EQUAL the
    // from-scratch sketch of the fact rows, not just sit in the envelope
    val raw = shape(Tables.lineitem(spark, sfDir))
    assert(viaMv.collect().toSeq == raw.collect().toSeq)
  }

  test("non-default sketch geometry blocks the sketch pushdown") {
    val (_, base, _) = installed
    // lc algo: the MV stores hll(b=16) partials - not answerable
    val df = base.groupBy("l_returnflag")
      .agg(GraftFunctions.approx_distinct(col("l_orderkey"), "lc")
        .getField("cardinality").as("est"))
    assert(planOf(df).contains("fact_lineitem.parquet"))
  }

  test("rollup with a non-answerable aggregate keeps the fact scan") {
    val (_, base, _) = installed
    val df = base.rollup("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("d"))
    assert(planOf(df).contains("fact_lineitem.parquet"))
  }

  test("downstream operators resolve against rewritten output (exprIds kept)") {
    val (_, base, _) = installed
    val top = Mv.q147Shape(base).filter(col("n") > 0)
      .select(col("l_returnflag"), (col("sum_qty") / col("n")).as("per_row"))
      .limit(2)
    assert(planOf(top).contains("mv_lineitem_rfls"))
    assert(top.collect().length == 2)
  }
}
