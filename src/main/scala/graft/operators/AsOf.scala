package graft.operators

import graft.sources.Tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join: for each left row, attach the payload of
  * the latest right row with the same key and `rightTime <= leftTime`.
  *
  * Spark has no native ASOF join; the scalable formulation is NOT a range
  * join (which explodes to a cross product within key) but a union +
  * carry-forward: tag both sides, hash-shuffle once on the key, sort each
  * partition by (time, side), and let a running `last(payload, ignoreNulls)`
  * window carry the most recent right payload into every subsequent left
  * row. One shuffle, O(n log n) per key group, no candidate blow-up — the
  * same shape at 60k rows and at 100 TB. Right rows sort before left rows at
  * equal timestamps, so the match is inclusive (ts >= rightTime), matching
  * DuckDB's ASOF JOIN semantics which the oracle uses.
  */
object AsOf {

  /** @param payload right-side columns to attach (must not collide with
    *                left column names); all become nullable. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left.select(
      Seq(col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftCols.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val rTagged = right.select(
      Seq(col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry ONE struct built only for right rows, not the payload columns
    // individually: a right row whose payload column is genuinely NULL must
    // still count as the match (and attach NULL), not be skipped in favor of
    // an older right row — `last(payload, ignoreNulls)` can't tell "NULL
    // payload" from "no right row yet", the struct marker can
    val carried = lTagged.unionByName(rTagged)
      .select(Seq(col("__side")) ++ leftCols.map(col) :+
        last(when(col("__side") === 0, struct(payload.map(col): _*)),
          ignoreNulls = true).over(w).as("__pay"): _*)
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__pay").getField(p).as(p)): _*)
  }

  /** Declared query: each event joined to the user's most recent order as of
    * the event time. The right side is deduped to one order per
    * (custkey, date) — max orderkey — so ties are deterministic in both
    * engines. */
  def q23AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id")
    val orders = Tables.orders(spark, dir)
      .groupBy("o_custkey", "o_orderdate")
      .agg(max("o_orderkey").as("o_orderkey"))
    asofJoin(events, orders, "user_id", "o_custkey", "ts", "o_orderdate",
        payload = Seq("o_orderkey"))
      .select("event_id", "o_orderkey")
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_asof_join" -> (q23AsofJoin _))

  val oracles: Map[String, String] = Map(
    "q23_asof_join" ->
      """SELECT e.event_id, o.o_orderkey
        |FROM events e ASOF LEFT JOIN
        |  (SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        |   FROM orders GROUP BY o_custkey, o_orderdate) o
        |ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin)
}
