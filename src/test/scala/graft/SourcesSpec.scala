package graft

import graft.sources.Tables

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink coverage (SURVEY §2b "scans / sources / sinks"): every
  * format the engine claims round-trips its data — parquet (primary),
  * ORC, CSV, JSON — through DataFrameWriter/DataFrameReader. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-src").toString

  private lazy val sample = Tables.orders(spark, sf)
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  private def fingerprint(df: org.apache.spark.sql.DataFrame): Array[String] =
    df.collect().map(_.toString).sorted

  test("parquet round-trip") {
    val dir = tmp()
    sample.write.mode(SaveMode.Overwrite).parquet(dir)
    assert(fingerprint(spark.read.parquet(dir)).sameElements(fingerprint(sample)))
  }

  test("orc round-trip") {
    val dir = tmp()
    sample.write.mode(SaveMode.Overwrite).orc(dir)
    assert(fingerprint(spark.read.orc(dir)).sameElements(fingerprint(sample)))
  }

  test("csv round-trip with header and explicit schema") {
    val dir = tmp()
    sample.write.mode(SaveMode.Overwrite).option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(sample.schema).csv(dir)
    assert(fingerprint(back).sameElements(fingerprint(sample)))
  }

  test("json round-trip with explicit schema") {
    val dir = tmp()
    sample.write.mode(SaveMode.Overwrite).json(dir)
    val back = spark.read.schema(sample.schema).json(dir)
    assert(fingerprint(back).sameElements(fingerprint(sample)))
  }

  test("binary sketch columns survive a parquet store-and-merge cycle") {
    import GraftFunctions._
    GraftFunctions.register(spark)
    val dir = tmp()
    Tables.lineitem(spark, sf)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(approx_distinct(col("l_orderkey")).as("sk"))
      .write.mode(SaveMode.Overwrite).parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(approx_distinct(col("sk")).as("d"))
      .select(col("d.cardinality")).head().getLong(0)
    val oneShot = Tables.lineitem(spark, sf)
      .agg(approx_distinct(col("l_orderkey")).as("d"))
      .select(col("d.cardinality")).head().getLong(0)
    assert(merged == oneShot)
  }
}
