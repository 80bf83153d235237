package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Source layer: the engine reads the driver's parquet star schema
  * (TESTDATA.md / FIXTURES.md). The only normalization is `events.ts`, written
  * as parquet TIMESTAMP(NANOS) which Spark refuses by default
  * ([PARQUET_TYPE_ILLEGAL]): we read nanos as long
  * (`spark.sql.legacy.parquet.nanosAsLong`, set in [[Tables.configure]]) and
  * surface it as a proper TimestampType (micros) column.
  *
  * Everything else is a plain columnar parquet scan, so Catalyst's predicate
  * pushdown / column pruning / partition pruning apply untouched — at 100 TB
  * these scans are the dominant cost and must stay declarative.
  */
object Tables {
  /** Session configs the source layer depends on; safe to call repeatedly. */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    configure(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      // integral `div`, NOT `/`: Divide casts integrals to double, and 2024
      // epoch-nanos (~1.7e18) exceed double's 2^53 exact range — ~25% of
      // values would come back off by 1 µs vs true truncation
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
