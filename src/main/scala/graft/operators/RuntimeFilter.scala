package graft.operators

import graft.GraftFunctions
import graft.sources.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime join pruning — the distributed pattern for joining
  * a huge fact table against a selective dimension at 100 TB:
  *
  *  1. aggregate the dimension's join keys into one Bloom filter
  *     ([[graft.functions.BloomAgg]] — partial filters OR across the
  *     shuffle, so the build is one narrow pass over the dim);
  *  2. materialize the few-MB filter once (the same move Spark's own
  *     InjectRuntimeFilter makes by executing a subquery — NOT a per-row
  *     collect) and probe it as a literal in a codegen'd scan filter;
  *  3. finish with the exact join.
  *
  * Because a Bloom filter has NO false negatives, step 2 never drops a
  * matching row — the result is provably identical to the plain join, which
  * is exactly what the q64 oracle checks. The win at scale: the shuffle
  * after step 2 carries only fact rows that can match (plus the FPR), not
  * the whole fact table.
  */
object RuntimeFilter {

  /** Semi-join `fact` to `dim` with a bloom prefilter on the fact side.
    * Identical rows to a plain LEFT SEMI join, cheaper shuffle. */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, numBits: Int = 1 << 20, numHashes: Int = 7): DataFrame = {
    val bloomBytes = dim
      .agg(GraftFunctions.bloom_agg(col(dimKey), numBits, numHashes))
      .head().getAs[Array[Byte]](0)
    val dimKeys = dim.select(col(dimKey).as("__dim_key"))
    fact
      .filter(GraftFunctions.might_contain(lit(bloomBytes), col(factKey)))
      .join(dimKeys, col(factKey) === col("__dim_key"), "left_semi")
  }

  /** Revenue by order priority for customers in the BUILDING segment,
    * computed as bloom-prefilter → exact semi-join. The oracle runs the
    * plain semi-join; hash equality proves the no-false-negative contract
    * end-to-end through the Catalyst wiring. */
  def q64BloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
    bloomSemiJoin(Tables.orders(spark, dir), building, "o_custkey", "c_custkey")
      .groupBy("o_orderpriority")
      // decimal-anchored double sum: order-independent, so the hash gate is
      // deterministic under any partitioning (same pattern as Relational)
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q64_bloom_semi_join" -> (q64BloomSemiJoin _))

  val oracles: Map[String, String] = Map(
    "q64_bloom_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders WHERE o_custkey IN (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
