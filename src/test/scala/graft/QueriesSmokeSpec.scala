package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Regression net for the driver contract: every declared query must build
  * a plan and execute at sf0.001, and the oracle map must stay consistent
  * with the query map. Catches breakage the per-operator specs miss. */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  test("oracle keys are a subset of declared queries; no orphans") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((os -- qs).isEmpty, s"oracles without queries: ${os -- qs}")
    val rowsOnly = qs -- os
    // every declared query is oracle-gated — a new rows-only query is a
    // mistake unless deliberately documented here
    assert(rowsOnly.isEmpty, s"rows-only queries appeared: $rowsOnly")
  }

  test("every declared query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
