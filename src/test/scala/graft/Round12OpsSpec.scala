package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 optimization guards: internals changed for speed must stay
  * bit-identical to the shapes they replaced. */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  /** The OLD q279 replicate pipeline (r11 form): per-row hex-digit bitmask,
    * ×R explode, declarative (g, b) aggregation with decimal buffers — the
    * ground truth the single-pass [[graft.functions.ReplicateMoments]]
    * aggregate must reproduce exactly. */
  private def repsViaExplode(base: DataFrame, r: Int): DataFrame =
    base
      .withColumn("mask", when(col("h").isNotNull,
        (0 until r).map(b =>
            when(ascii(col("h").substr(lit(b + 1), lit(1))) <= 55,
              lit(1L << b)).otherwise(0L))
          .reduce(_ + _)))
      .select(col("g"), col("v"), col("mask"))
      .withColumn("b", explode(sequence(lit(0), lit(r - 1))))
      .withColumn("parm", expr("(shiftright(mask, b) & 1) = 1"))
      .groupBy("g", "b")
      .agg(sum(when(col("parm"), 1L).otherwise(0L)).as("m1"),
        sum(when(col("parm"), col("v").cast("decimal(38,0)"))
          .otherwise(lit(0).cast("decimal(38,0)")))
          .cast("decimal(38,0)").as("t1"))

  private def repsViaAgg(base: DataFrame, r: Int): DataFrame =
    base
      .groupBy("g")
      .agg(GraftFunctions.replicate_moments(col("h"), col("v"), r).as("rm"))
      .select(col("g"), posexplode(col("rm")).as(Seq("b", "m")))
      .select(col("g"), col("b").cast("int").as("b"),
        col("m").getField("m1").as("m1"), col("m").getField("t1").as("t1"))

  test("replicate_moments_agg ≡ explode pipeline (incl. NULL md5, NULL value, negatives)") {
    val rows = Seq(
      ("A", Some("k1"), Some(120L)),
      ("A", Some("k2"), Some(-35L)),
      ("A", Some("k3"), None), // NULL value: counted in m1, skipped by t1
      ("A", None, Some(99L)), // NULL key ⇒ NULL md5 ⇒ no pseudo-arm
      ("B", Some("k4"), Some(7L)),
      ("B", Some("k5"), Some(Long.MaxValue / 4)),
      ("B", Some("k6"), Some(Long.MaxValue / 4)),
      ("C", None, None))
    val base = rows.toDF("g", "k", "v0")
      .select(col("g"), col("v0").as("v"), md5(col("k").cast("string")).as("h"))
    for (r <- Seq(4, 16, 32)) {
      val expect = repsViaExplode(base, r)
        .select("g", "b", "m1", "t1").collect()
        .map(x => (x.getString(0), x.getInt(1), x.getLong(2),
          x.getDecimal(3).toPlainString)).toSet
      val got = repsViaAgg(base, r)
        .select("g", "b", "m1", "t1").collect()
        .map(x => (x.getString(0), x.getInt(1), x.getLong(2),
          x.getDecimal(3).toPlainString)).toSet
      assert(got == expect, s"r=$r")
    }
  }

  test("replicate_moments_agg 128-bit sums survive partial/final serialization") {
    // many partitions force serialize/deserialize + merge of partial buffers;
    // values near Long.MaxValue force the 128-bit carry path
    val n = 64
    val big = Long.MaxValue / 2
    val base = spark.range(n).repartition(8)
      .select(lit("G").as("g"), lit(big).as("v"),
        md5(col("id").cast("string")).as("h"))
    val got = repsViaAgg(base, 8).select("b", "m1", "t1").collect()
      .map(x => (x.getInt(0), x.getLong(1), new java.math.BigDecimal(x.getDecimal(2).toPlainString)))
    val expect = repsViaExplode(base, 8).select("b", "m1", "t1").collect()
      .map(x => (x.getInt(0), x.getLong(1), new java.math.BigDecimal(x.getDecimal(2).toPlainString)))
    assert(got.sortBy(_._1).toSeq == expect.sortBy(_._1).toSeq)
    // sanity: sums really exceeded 2^63 (the carry path was exercised)
    assert(got.exists(_._3.compareTo(new java.math.BigDecimal(Long.MaxValue)) > 0))
  }
}
