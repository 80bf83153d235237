package graft

import graft.operators.{AsOf, Audit, Basket, Behavior, Cdc, Dedup, Graph, Layout, Linkage, Ml, Multimodal, Mv, Relational, RuntimeFilter, Sampling, Similarity, SketchQueries, Skew, Skyline, Stats, TextAnalysis}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared operator inventory (SURVEY §2); each
  * entry with an `oracleSql` twin is hash-checked against DuckDB at sf0.01,
  * the rest get a rows-only check (approximate/engine-specific operators).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's signature capability: grouped approximate distinct
    * counts from mergeable HLL sketches. */
  def entry(spark: SparkSession): DataFrame = {
    GraftFunctions.register(spark)
    sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy("l_returnflag")
      .agg(GraftFunctions.approx_distinct(col("l_orderkey")).as("d"))
      .select(col("l_returnflag"), col("d.cardinality").as("approx_orders"))
  }

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Numbering note: q39/q54/q55/q58/q59 were never declared — the numbers
    * were skipped during rounds 3–4 planning and the gaps are kept stable so
    * query names stay comparable across rounds' CORRECTNESS/BENCH artifacts.
    * q417/q418/q419 were reserved in round 11 for ops (conformal quantile,
    * degree assortativity, CUPED) that turned out to duplicate q245/q208/
    * q250 and were dropped. They are not missing operators. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ SketchQueries.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++ AsOf.queries ++
      RuntimeFilter.queries ++ Sampling.queries ++ Skew.queries ++ Layout.queries ++
      Cdc.queries ++ Audit.queries ++ Behavior.queries ++ Linkage.queries ++
      Skyline.queries ++ Graph.queries ++ Mv.queries ++ Basket.queries ++
      Stats.queries ++ Ml.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate candidates, engine-specific hashes) → rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ SketchQueries.oracles ++ TextAnalysis.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Multimodal.oracles ++ AsOf.oracles ++
      RuntimeFilter.oracles ++ Sampling.oracles ++ Skew.oracles ++ Layout.oracles ++
      Cdc.oracles ++ Audit.oracles ++ Behavior.oracles ++ Linkage.oracles ++
      Skyline.oracles ++ Graph.oracles ++ Mv.oracles ++ Basket.oracles ++
      Stats.oracles ++ Ml.oracles
}
