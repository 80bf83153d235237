package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global total-order rank / running-sum primitives.
  *
  * `Window.orderBy(...)` with no partition spec makes Spark move the WHOLE
  * input into ONE task (`WindowExec: No Partition Defined`) — the classic
  * silent scale-killer behind global ranks, ntiles and cumulative shares.
  * The scalable shape is rank composition over a range exchange:
  *
  *   1. `repartitionByRange(sortCols)` — a distributed sort-order exchange
  *      (every partition holds a contiguous key range, ranges are ordered
  *      by partition id);
  *   2. per-partition `row_number` / running sums under
  *      `Window.partitionBy(partition id)` — embarrassingly parallel;
  *   3. per-partition row/sum totals (one tiny aggregate, ≤ P rows) turned
  *      into exclusive offsets with a triangular broadcast self-join (no
  *      window at all, so not even a bounded single-partition WindowExec
  *      appears in the plan);
  *   4. global value = partition offset + local value.
  *
  * Results are deterministic even though range *boundaries* are sampled:
  * rank = offset + local rank is boundary-invariant given a total order.
  *
  * Requirements: `sortCols` must be a TOTAL order (no two rows equal on the
  * full tuple — callers tiebreak on a unique id), and prefix-sum columns
  * must be LongType (exact integer discipline; sums must fit a long).
  */
object Rank {

  /** Adds `rnCol` = 1-based global rank under `sortCols`, plus, for each
    * `(name, c)` in `prefixSums`, column `name` = INCLUSIVE running sum of
    * `c` in that order. One range exchange + one pid-hash exchange of the
    * data, one broadcast of the ≤ P-row offset frame. */
  def globalRankPrefix(df: DataFrame, sortCols: Seq[Column],
      prefixSums: Seq[(String, Column)] = Nil,
      rnCol: String = "__rn"): DataFrame = {
    val spark = df.sparkSession
    val p = math.max(1, spark.conf.get("spark.sql.shuffle.partitions").toInt)
    // The lazy localCheckpoint is CORRECTNESS-critical, not an optimization:
    // the offsets branch and the data branch below both consume this frame,
    // and RangePartitioner samples its boundaries per physical execution —
    // if the diamond re-executed the exchange per branch (exchange reuse is
    // not guaranteed once this subtree is nested under further joins; round
    // 9 observed exactly that), the two branches would disagree on which
    // rows partition N holds and the composed ranks would be silently off.
    // Checkpointing pins ONE materialization (same RDD identity on both
    // paths), making rank = offset + local rank boundary-invariant. The
    // frame is the already-reduced rank input (entity/histogram scale, not
    // raw rows), so the executor-local storage cost is bounded.
    val ranged = df.repartitionByRange(p, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val wLoc = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val wRun = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = prefixSums.foldLeft(
      ranged.withColumn("__lrn", row_number().over(wLoc).cast("long"))) {
      case (d, (name, c)) => d.withColumn(s"__lps_$name",
        sum(c.cast("long")).over(wRun))
    }
    // per-partition totals from the PRE-window branch so the reused range
    // exchange feeds both sides and the totals need no second window pass
    val totAggs = (count(lit(1)).cast("long").as("__cnt")) +:
      prefixSums.map { case (name, c) =>
        sum(c.cast("long")).as(s"__tot_$name") }
    val perPart = ranged.groupBy("__pid").agg(totAggs.head, totAggs.tail: _*)
    val lower = perPart.select(
      (col("__pid").as("__lpid") +: col("__cnt").as("__lcnt") +:
        prefixSums.map { case (name, _) =>
          col(s"__tot_$name").as(s"__ltot_$name") }): _*)
    // exclusive offsets: triangular join over the ≤ P-row totals frame
    val offAggs = (coalesce(sum(col("__lcnt")), lit(0L)).as("__rn_off")) +:
      prefixSums.map { case (name, _) =>
        coalesce(sum(col(s"__ltot_$name")), lit(0L)).as(s"__off_$name") }
    val offs = perPart
      .join(broadcast(lower), col("__lpid") < col("__pid"), "left")
      .groupBy("__pid").agg(offAggs.head, offAggs.tail: _*)
    val out = local.join(broadcast(offs), Seq("__pid"))
      .withColumn(rnCol, col("__rn_off") + col("__lrn"))
    val withPs = prefixSums.foldLeft(out) { case (d, (name, _)) =>
      d.withColumn(name, col(s"__off_$name") + col(s"__lps_$name"))
    }
    withPs.drop(
      ("__pid" +: "__lrn" +: "__rn_off" +:
        prefixSums.flatMap { case (name, _) =>
          Seq(s"__lps_$name", s"__off_$name") }): _*)
  }

  /** Spark-exact `ntile(k)` from a 1-based global rank and the frame size —
    * the first `n % k` buckets carry `n div k + 1` rows (NTile's sizing),
    * computed arithmetically so no global window is needed. Takes COLUMN
    * NAMES (long-typed; `nName` is typically a broadcast 1-row total) so
    * the exact integral `div` operator is usable; the CASE short-circuits,
    * so the `div base` branch never runs when base = 0 (n < k). */
  def ntileFromRank(rnName: String, nName: String, k: Int): Column = {
    val (rn, n) = (rnName, nName)
    expr(
      s"""CAST(CASE WHEN $rn <= ($n % $k) * (($n div $k) + 1)
         |  THEN ($rn - 1) div (($n div $k) + 1) + 1
         |  ELSE ($n % $k) + ($rn - ($n % $k) * (($n div $k) + 1) - 1)
         |       div ($n div $k) + 1 END AS INT)""".stripMargin)
  }
}
