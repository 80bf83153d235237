package graft

import graft.operators.AsOf

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom AS-OF physical operator ([[graft.plans.AsOfJoinExec]]):
  * semantics against the window-composition twin and hand fixtures, plan
  * shape, and edge cases (empty right, null keys/times, inclusive ties,
  * stale buffered key). */
class AsOfExecSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark: SparkSession = TestSpark.session

  private def ts(sec: Long) =
    Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  test("exec equals the window-composition asofJoin on the fixture") {
    val sf = "/root/testdata/sf0.001"
    val events = sources.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id")
    val orders = sources.Tables.orders(spark, sf)
      .groupBy("o_custkey", "o_orderdate")
      .agg(max("o_orderkey").as("o_orderkey"))
    val viaExec = AsOf.asofJoinExec(events, orders,
        "user_id", "o_custkey", "ts", "o_orderdate")
      .select("event_id", "o_orderkey").orderBy("event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    val viaWindow = AsOf.asofJoin(events, orders, "user_id", "o_custkey",
        "ts", "o_orderdate", payload = Seq("o_orderkey"))
      .select("event_id", "o_orderkey").orderBy("event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(viaExec.length == 1000)
    assert(viaExec.toSeq == viaWindow.toSeq)
  }

  test("plan shape: AsOfJoinExec with one exchange and sort per side") {
    val sf = "/root/testdata/sf0.001"
    val events = sources.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id")
    val orders = sources.Tables.orders(spark, sf)
      .select(col("o_custkey").as("ok"), col("o_orderdate").as("od"),
        col("o_orderkey"))
    val df = AsOf.asofJoinExec(events, orders, "user_id", "ok", "ts", "od")
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan
    val execs = collect(plan) {
      case e: graft.plans.AsOfJoinExec => e
    }
    assert(execs.size == 1)
    val shuffles = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.size == 2, s"one exchange per side, got ${shuffles.size}")
  }

  test("inclusive tie, latest-match, no-match, and stale-buffer semantics") {
    import spark.implicits._
    // left keys 1..3; right provides: key 1 at t=10 and t=20; key 2 none;
    // key 9 rows that must NOT leak into key 3's buffer
    val left = Seq(
      (1L, ts(10), "l1a"), // tie with right t=10 -> inclusive match r10
      (1L, ts(25), "l1b"), // latest right <= 25 is r20
      (1L, ts(5), "l1c"),  // before any right -> null
      (2L, ts(50), "l2"),  // key has no right rows -> null
      (3L, ts(99), "l3")   // right key 9 buffered earlier must not match
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(10), "r10"), (1L, ts(20), "r20"), (9L, ts(1), "r9")
    ).toDF("rk", "rt", "pay")
    // single partition exercises the stale-buffer path deterministically
    val out = AsOf.asofJoinExec(left.repartition(1), right.repartition(1),
        "k", "rk", "t", "rt")
      .select("tag", "pay").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    assert(out == Map("l1a" -> "r10", "l1b" -> "r20", "l1c" -> null,
      "l2" -> null, "l3" -> null))
  }

  test("empty right side and null keys/times never match") {
    import spark.implicits._
    val left = Seq(
      (Some(1L), Some(ts(10)), "a"),
      (None, Some(ts(10)), "nullkey"),
      (Some(1L), None, "nulltime")
    ).toDF("k", "t", "tag")
    val emptyRight = Seq.empty[(Long, Timestamp, String)].toDF("rk", "rt", "pay")
    val out0 = AsOf.asofJoinExec(left, emptyRight, "k", "rk", "t", "rt")
      .select("tag", "pay").collect()
    assert(out0.length == 3 && out0.forall(_.isNullAt(1)))
    // right rows with null key/time are skipped, not matched
    val right = Seq((Option.empty[Long], Some(ts(1)), "badk"),
      (Some(1L), Option.empty[Timestamp], "badt"),
      (Some(1L), Some(ts(5)), "good")).toDF("rk", "rt", "pay")
    val out1 = AsOf.asofJoinExec(left, right, "k", "rk", "t", "rt")
      .select("tag", "pay").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    assert(out1 == Map("a" -> "good", "nullkey" -> null, "nulltime" -> null))
  }
}
