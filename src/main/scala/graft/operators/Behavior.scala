package graft.operators

import graft.sources.Tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event analytics: ordered funnels and cohort retention.
  *
  * Both operators are per-user sequence computations, and both are built
  * to touch the events table ONCE and shuffle ONCE on the user key:
  *
  *  - the funnel resolves "first qualifying step-k instant" with running
  *    conditional-min windows over the per-user time order — a chain of
  *    windows over the SAME (partition, sort), so Catalyst plans one
  *    Exchange + one Sort and evaluates every step in a single Window
  *    operator pass. No step-per-step self-joins (the naive shape pays
  *    one shuffle per funnel step and re-scans the fact table each time).
  *  - retention derives each user's cohort with a partition-wide min
  *    window instead of an aggregate + self-join, then reduces to
  *    (cohort, offset) counts.
  *
  * Per-user state is O(1) (a handful of running minima), so user skew —
  * one user with millions of events — costs sort time, never memory. At
  * 100 TB both plans are: scan → hash-exchange on user → sort → window →
  * partial agg, with the final (cohort, offset) / step aggregate a
  * few-hundred-row reduction.
  */
object Behavior {

  /** Per-user first-completion instants of an ordered step sequence.
    *
    * Step 0's instant is the user's earliest `stepTypes(0)` event; step
    * k's is the earliest `stepTypes(k)` event STRICTLY after the step
    * k−1 instant and within `horizonSeconds` of it (the conversion
    * window). Rows keep one column per step (`t0 … t(n-1)`, micros),
    * NULL once the chain breaks.
    *
    * The running-min window trick that makes this one pass: ordered by
    * time, every row at or after the user's first step-(k−1) qualifying
    * event sees `min(candidate_{k-1}) over (… unbounded preceding)` ==
    * the FINAL step-(k−1) instant, so "candidate for step k" can be
    * decided row-locally against the running value. Rows before that
    * instant see NULL or a later value and fail the strict `>` — either
    * way they are excluded, so the composition is exact, not an
    * approximation of the dependent chain. RANGE frames (the default)
    * keep equal-timestamp ties deterministic in any engine. */
  def funnelUserSteps(events: DataFrame, tsCol: String, userCol: String,
      typeCol: String, stepTypes: Seq[String],
      horizonSeconds: Long): DataFrame = {
    require(stepTypes.nonEmpty, "funnel needs at least one step")
    require(horizonSeconds > 0, s"horizon must be positive: $horizonSeconds")
    val w = Window.partitionBy(userCol).orderBy(col("__us"))
    val us = expr(s"unix_micros($tsCol)")
    val horizonUs = horizonSeconds * 1000000L
    // candidate instant per step, then its running min; step k's candidate
    // references step k-1's running min — same window spec throughout
    var df = events.select(col(userCol), col(typeCol).as("__et"), us.as("__us"))
    var prevRun: Column = null
    for ((st, i) <- stepTypes.zipWithIndex) {
      val cand =
        if (i == 0) when(col("__et") === st, col("__us"))
        else when(col("__et") === st && col("__us") > prevRun &&
          col("__us") <= prevRun + horizonUs, col("__us"))
      df = df.withColumn(s"__c$i", cand)
      prevRun = min(col(s"__c$i")).over(w)
    }
    df.groupBy(userCol)
      .agg(min(s"__c0").as("t0"),
        stepTypes.indices.drop(1).map(i => min(s"__c$i").as(s"t$i")): _*)
  }

  /** Funnel step counts: one row per step with the number of users whose
    * chain reached it. */
  def funnelCounts(events: DataFrame, tsCol: String, userCol: String,
      typeCol: String, stepTypes: Seq[String],
      horizonSeconds: Long): DataFrame = {
    val steps = funnelUserSteps(events, tsCol, userCol, typeCol, stepTypes,
      horizonSeconds)
    val totals = steps.agg(
      count(col("t0")).as("n0"),
      stepTypes.indices.drop(1).map(i => count(col(s"t$i")).as(s"n$i")): _*)
    val stackArgs = stepTypes.zipWithIndex
      .map { case (st, i) => s"${i + 1}L, '$st', n$i" }
      .mkString(", ")
    totals.selectExpr(
      s"stack(${stepTypes.size}, $stackArgs) AS (step, event_type, n_users)")
      .orderBy("step")
  }

  /** Cohort retention: users grouped by first-seen `bucketSeconds` bucket
    * (the cohort), counted per activity-day offset 0..`maxOffset` buckets
    * after it, with the retention rate against the cohort's size (= its
    * offset-0 count: every user is active in their own first bucket, so
    * the denominator needs no second pass). */
  def retentionCohorts(events: DataFrame, tsCol: String, userCol: String,
      bucketSeconds: Long, maxOffset: Int): DataFrame = {
    require(bucketSeconds > 0 && maxOffset >= 0,
      s"bad retention grid: bucket=$bucketSeconds maxOffset=$maxOffset")
    val bucketUs = bucketSeconds * 1000000L
    val perUser = events
      .select(col(userCol), expr(s"unix_micros($tsCol) div $bucketUs").as("b"))
      .withColumn("cohort", min(col("b")).over(Window.partitionBy(userCol)))
      .select(col(userCol), col("cohort"), (col("b") - col("cohort")).as("offs"))
      .filter(col("offs") <= maxOffset)
      .distinct()
    val counts = perUser.groupBy("cohort", "offs")
      .agg(count(lit(1)).as("n_active"))
    counts
      .withColumn("cohort_size",
        max(when(col("offs") === 0, col("n_active")))
          .over(Window.partitionBy("cohort")))
      .select((col("cohort") * bucketSeconds).as("cohort_epoch"), col("offs"),
        col("n_active"),
        (col("n_active").cast("double") / col("cohort_size").cast("double"))
          .as("retain_rate"))
      .orderBy("cohort_epoch", "offs")
  }

  // ---- declared queries ----

  /** view → click → purchase within 24 h per hop, over the events table.
    * Strict hash gate: the oracle reproduces the dependent chain with the
    * same window composition in SQL. */
  def q121FunnelSteps(spark: SparkSession, dir: String): DataFrame =
    funnelCounts(Tables.events(spark, dir), "ts", "user_id", "event_type",
      Seq("view", "click", "purchase"), horizonSeconds = 24 * 3600L)

  /** Daily cohorts, activity offsets 0–7 days. Strict hash gate; the
    * rate is an exact integer-ratio double, bit-identical in any engine. */
  def q122RetentionCohorts(spark: SparkSession, dir: String): DataFrame =
    retentionCohorts(Tables.events(spark, dir), "ts", "user_id",
      bucketSeconds = 86400L, maxOffset = 7)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q121_funnel_steps" -> (q121FunnelSteps _),
    "q122_retention_cohorts" -> (q122RetentionCohorts _))

  val oracles: Map[String, String] = Map(
    // the same running-conditional-min window chain, in ANSI SQL
    "q121_funnel_steps" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |w1 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
        |    OVER (PARTITION BY user_id ORDER BY us) AS r0 FROM e),
        |w2 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'click' AND us > r0
        |      AND us <= r0 + 86400000000 THEN us END)
        |    OVER (PARTITION BY user_id ORDER BY us) AS r1 FROM w1),
        |w3 AS (
        |  SELECT *, CASE WHEN event_type = 'purchase' AND us > r1
        |      AND us <= r1 + 86400000000 THEN us END AS c2,
        |    CASE WHEN event_type = 'view' THEN us END AS c0,
        |    CASE WHEN event_type = 'click' AND us > r0
        |      AND us <= r0 + 86400000000 THEN us END AS c1
        |  FROM w2),
        |u AS (
        |  SELECT user_id, MIN(c0) AS t0, MIN(c1) AS t1, MIN(c2) AS t2
        |  FROM w3 GROUP BY user_id),
        |t AS (
        |  SELECT COUNT(t0) AS n0, COUNT(t1) AS n1, COUNT(t2) AS n2 FROM u)
        |SELECT CAST(s.step AS BIGINT) AS step, s.event_type,
        |  CASE s.step WHEN 1 THEN n0 WHEN 2 THEN n1 ELSE n2 END AS n_users
        |FROM t CROSS JOIN (VALUES (1, 'view'), (2, 'click'),
        |  (3, 'purchase')) AS s(step, event_type)
        |ORDER BY step""".stripMargin,
    "q122_retention_cohorts" ->
      """WITH b AS (
        |  SELECT user_id,
        |    CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS b FROM events),
        |c AS (
        |  SELECT DISTINCT user_id, b,
        |    MIN(b) OVER (PARTITION BY user_id) AS cohort FROM b),
        |n AS (
        |  SELECT cohort, b - cohort AS offs, COUNT(*) AS n_active
        |  FROM c WHERE b - cohort <= 7 GROUP BY 1, 2)
        |SELECT cohort * 86400 AS cohort_epoch, offs, n_active,
        |  CAST(n_active AS DOUBLE) / CAST(MAX(CASE WHEN offs = 0
        |    THEN n_active END) OVER (PARTITION BY cohort) AS DOUBLE)
        |    AS retain_rate
        |FROM n ORDER BY cohort_epoch, offs""".stripMargin)
}
