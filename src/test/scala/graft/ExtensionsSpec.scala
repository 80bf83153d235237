package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The cluster deployment path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` has every engine function
  * available in SQL with no register() call. */
class ExtensionsSpec extends AnyFunSuite {

  test("extensions-injected session resolves engine functions from SQL") {
    TestSpark.session // ensure the shared context exists first
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = s.sql(
        """SELECT approx_distinct(id).cardinality AS n,
          |  lang_id('the cat and the dog') AS lang,
          |  sketch_estimate(approx_distinct(id).binary) AS n2
          |FROM range(1000)""".stripMargin).head()
      assert(row.getLong(0) == 1000 || math.abs(row.getLong(0) - 1000) <= 12)
      assert(row.getString(1) == "en")
      assert(row.getLong(2) == row.getLong(0))
      // injected functions show up in catalog listing too
      assert(s.catalog.functionExists("sketch_union"))
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }
}
