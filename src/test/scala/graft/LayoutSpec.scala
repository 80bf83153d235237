package graft

import graft.operators.Layout

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: interleave bit laws, SQL-twin equivalence, row-group
  * stats quality vs a single-column sort, and write neutrality. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("zValue interleaves bits as documented") {
    val df = Seq((1L, 0L), (0L, 1L), (3L, 3L), (0xFFFFL, 0xFFFFL), (0L, 0L))
      .toDF("a", "b")
    val got = df.select(Layout.zValue(Seq($"a", $"b"), 16)).as[Long].collect().toSeq
    // bit i of col0 -> position 2i; bit i of col1 -> position 2i+1
    assert(got == Seq(1L, 2L, 15L, 0xFFFFFFFFL, 0L))
  }

  test("zValueSql is the bit-exact twin of zValue") {
    val df = (0L until 2000L).map(k => (k * 37 % 1999, k * 91 % 97)).toDF("a", "b")
    df.createOrReplaceTempView("zt")
    val viaCol = df.select(Layout.zValue(Seq($"a", $"b"), 16).as("z"))
      .as[Long].collect().sorted.toSeq
    val viaSql = spark.sql(
        s"SELECT ${Layout.zValueSql(Seq("a", "b"), 16)} AS z FROM zt")
      .as[Long].collect().sorted.toSeq
    assert(viaCol == viaSql)
  }

  /** Fraction of row groups whose [min,max] stats for `column` intersect
    * [lo, hi], read from the parquet footers themselves. */
  private def intersectingFraction(dir: String, column: String,
      lo: Long, hi: Long): (Double, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    var total = 0
    var hit = 0
    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        reader.getFooter.getBlocks.forEach { block =>
          val c = block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(fail(s"column $column not in footer"))
          val st = c.getStatistics
          val mn = st.genericGetMin.toString.toLong
          val mx = st.genericGetMax.toString.toLong
          total += 1
          if (mx >= lo && mn <= hi) hit += 1
        }
      } finally reader.close()
    }
    (hit.toDouble / math.max(total, 1), total)
  }

  test("z-order layout localizes BOTH dimensions; single-column sort does not") {
    // controlled 2-D uniform data: 200k points over [0, 65536)^2.
    // splitmix64 finalizer per salt — a mere affine shift of one hash would
    // leave x and y correlated and the x-sort would localize y too
    def h(k: Long, salt: Long): Long = {
      var z = k + salt * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      (z ^ (z >>> 31)) & 0xFFFFL
    }
    val pts = spark.range(200000L)
      .select($"id",
        udf((k: Long) => h(k, 1)).apply($"id").as("x"),
        udf((k: Long) => h(k, 2)).apply($"id").as("y"))
      .select("x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val zDir = s"$base/zorder"
    val linDir = s"$base/linear"
    val opts = Map("parquet.block.size" -> "65536")
    Layout.zorderWrite(pts, Layout.zValue(Seq($"x", $"y"), 16), zDir, 4, opts)
    // the single-column baseline: range-partitioned + sorted by x only
    pts.repartitionByRange(4, $"x").sortWithinPartitions($"x")
      .write.options(opts).mode("overwrite").parquet(linDir)

    // box selective in y only (1/16 of the domain): the x-sorted layout
    // cannot skip anything; the z-ordered one skips most row groups
    val (zFrac, zGroups) = intersectingFraction(zDir, "y", 0L, 4095L)
    val (linFrac, linGroups) = intersectingFraction(linDir, "y", 0L, 4095L)
    assert(zGroups > 20 && linGroups > 20,
      s"need many row groups for a meaningful test: z=$zGroups lin=$linGroups")
    assert(linFrac > 0.8, s"x-sorted layout should not localize y: $linFrac")
    assert(zFrac < 0.5, s"z-order should skip most row groups on y: $zFrac")
    assert(zFrac < linFrac * 0.6, s"z=$zFrac vs linear=$linFrac")

    // ... while still localizing x (a linear sort's home turf)
    val (zxFrac, _) = intersectingFraction(zDir, "x", 0L, 4095L)
    assert(zxFrac < 0.5, s"z-order should also localize x: $zxFrac")
  }

  test("zorderWrite is row-neutral: the rewritten table is the same multiset") {
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val dir = java.nio.file.Files.createTempDirectory("graft-zli").toString
    Layout.zorderWrite(li, Layout.zValue(Seq($"l_partkey", $"l_suppkey"), 16),
      dir, 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }

  test("zone map prunes files: the ranged scan reads a strict subset, content-exact") {
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-zm-test").toString
    li.repartitionByRange(12, $"l_shipdate").sortWithinPartitions("l_shipdate")
      .write.mode("overwrite").parquet(dir)
    val total = spark.read.parquet(dir).inputFiles.length
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val pruned = Layout.zoneMapPrunedScan(spark, dir, "l_shipdate", lo, hi)
    // ~1 year of a 7-year span clustered into 12 range files -> most skip
    assert(pruned.inputFiles.length < total,
      s"no files skipped: ${pruned.inputFiles.length} of $total")
    val expected = li.filter($"l_shipdate" >= lo && $"l_shipdate" < hi).count()
    assert(pruned.count() == expected, "pruned scan lost or duplicated rows")
    // an empty range prunes everything and still evaluates
    val none = Layout.zoneMapPrunedScan(spark, dir, "l_shipdate",
      lit("2100-01-01").cast("timestamp"), lit("2101-01-01").cast("timestamp"))
    assert(none.count() == 0L)
  }

  test("bloom manifest prunes files for point lookups, content-exact") {
    val o = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom-test").toString
    // hash layout on a DIFFERENT column: the key scatters across files,
    // so only the blooms (not zones) can prune this lookup
    o.repartition(16, $"o_custkey").write.mode("overwrite").parquet(dir)
    val total = spark.read.parquet(dir).inputFiles.length
    val manifest = Layout.bloomManifest(spark, dir, "o_orderkey",
      numBits = 1 << 17, numHashes = 5)
    val keys = Seq(1L, 7L, 4000L)
    val pruned = Layout.bloomPrunedScan(spark, dir, manifest, "o_orderkey", keys)
    // 3 keys over 16 files at fpp << 1: nearly all files skip
    assert(pruned.inputFiles.length < total,
      s"no files skipped: ${pruned.inputFiles.length} of $total")
    val expected = o.filter($"o_orderkey".isin(keys: _*)).count()
    assert(expected > 0 && pruned.count() == expected,
      "bloom pruning lost or duplicated rows")
    // keys absent from the table: may or may not read files (fp), but
    // returns zero rows either way
    val none = Layout.bloomPrunedScan(spark, dir, manifest, "o_orderkey",
      Seq(-12345L))
    assert(none.count() == 0L)
  }

  private implicit class JListAsScala[A](l: java.util.List[A]) {
    def asScala: Seq[A] = {
      val b = Seq.newBuilder[A]
      l.forEach(a => b += a)
      b.result()
    }
  }
}
