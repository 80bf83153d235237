package graft

import graft.operators.Mv

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for declared-constraint fk join elimination (q153). */
class JoinEliminationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"
  lazy val installed: (DataFrame, DataFrame) =
    Mv.installOrdersCustomerFk(spark, sfDir)

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("inner star join with fact-only select list is eliminated") {
    val (orders, customer) = installed
    val df = Mv.q153Shape(orders, customer)
    val plan = planOf(df)
    assert(!plan.contains("Join"), s"join not eliminated:\n$plan")
    assert(!plan.contains("dim_customer.parquet"))
    // bit-equal to actually executing the join (rule removed via raw
    // tables the constraint is not registered for)
    val raw = Mv.q153Shape(
      graft.sources.Tables.orders(spark, sfDir),
      graft.sources.Tables.customer(spark, sfDir))
    assert(planOf(raw).contains("Join"))
    assert(df.collect().toSeq == raw.collect().toSeq)
  }

  test("left outer join is eliminated without an RI declaration") {
    val (orders, customer) = installed
    // left outer on an fk NOT in riFkNames still eliminates (uniqueness
    // of the pk alone makes it row-preserving)
    val df = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"), "left")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
    assert(!planOf(df).contains("Join"))
  }

  test("dim column in the select list blocks elimination") {
    val (orders, customer) = installed
    val df = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("c_mktsegment")).as("n_seg"))
    assert(planOf(df).contains("Join"))
  }

  test("dim filter blocks elimination") {
    val (orders, customer) = installed
    val df = orders.join(
        customer.filter(col("c_mktsegment") === "BUILDING"),
        orders("o_custkey") === customer("c_custkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(planOf(df).contains("Join"))
  }

  test("non-equi or multi-condition joins are untouched") {
    val (orders, customer) = installed
    val df = orders.join(customer,
        orders("o_custkey") === customer("c_custkey") &&
          customer("c_acctbal") > 0)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(planOf(df).contains("Join"))
  }
}
