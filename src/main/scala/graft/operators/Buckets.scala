package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Hot-bucket guard + candidate-pair generation for LSH-style operators.
  *
  * Every near-dup operator in the engine generates candidates from rows
  * that share a bucket key, which is quadratic in bucket size. One
  * degenerate bucket (all-empty docs, all-zero vectors) turns into a
  * straggler task at scale, so buckets are capped at a fixed membership:
  * the `cap` smallest ids stay (deterministic), the rest are dropped from
  * candidate generation only — they can still be *found* via their other
  * bands/tables.
  *
  * No silent caps: the number of dropped rows rides the query itself as a
  * named observed metric (`Dataset.observe` — collected during the same
  * action, zero extra passes). A session-level [[QueryExecutionListener]]
  * WARN-logs any non-zero drop after each action, and callers/tests can read
  * `df.queryExecution.observedMetrics(metricName)` directly.
  */
object Buckets {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Keep at most `cap` members per bucket (smallest `idCol` values win).
    * NOTE: a query may contain each observed metric name at most once —
    * don't place the same capped relation on both sides of a self-join
    * (use [[candidatePairs]], which never self-joins, instead). */
  def cap(buckets: DataFrame, keyCols: Seq[String], idCol: String, cap: Int,
      metricName: String): DataFrame = {
    require(cap >= 1, s"bucket cap must be >= 1, got $cap")
    ensureListener(buckets.sparkSession)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol))
    buckets.withColumn("__bn", row_number().over(w))
      .observe(metricName,
        coalesce(sum(when(col("__bn") > cap, 1L).otherwise(0L)), lit(0L)).as("dropped_rows"),
        coalesce(sum(when(col("__bn") === cap + 1, 1L).otherwise(0L)), lit(0L)).as("overflow_buckets"),
        coalesce(max(col("__bn")).cast("long"), lit(0L)).as("max_bucket_size"))
      .filter(col("__bn") <= cap)
      .drop("__bn")
  }

  /** Candidate pairs within capped buckets, WITHOUT a bucket self-join:
    * the capped rows are aggregated once per bucket key (the groupBy
    * re-uses the cap window's clustering — no extra shuffle), and pairs
    * explode from the sorted, cap-bounded id list. A self-join formulation
    * evaluates the whole bucket-build pipeline once per join side; this
    * evaluates it once, period. Emits distinct (id_a < id_b) pairs;
    * payload (shingle sets, vectors, hashes) should be re-joined by id —
    * never carried through the pair explosion. */
  def candidatePairs(buckets: DataFrame, keyCols: Seq[String], idCol: String,
      bucketCap: Int, metricName: String): DataFrame = {
    val capped = cap(buckets, keyCols, idCol, bucketCap, metricName)
    capped.groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(col(idCol))).as("__ids"))
      .select(explode(flatten(transform(col("__ids"), (a, i) =>
        transform(slice(col("__ids"), i + lit(2), lit(bucketCap)), b =>
          struct(a.as("id_a"), b.as("id_b")))))).as("__p"))
      .select(col("__p.id_a"), col("__p.id_b"))
      .distinct()
  }

  private val flag = "graft.internal.bucketCapListener"

  private def ensureListener(spark: SparkSession): Unit = synchronized {
    if (!spark.conf.getOption(flag).contains("true")) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.endsWith("bucket_cap")) {
              val dropped = row.getAs[Long]("dropped_rows")
              if (dropped > 0)
                log.warn(s"graft: $name dropped $dropped candidate rows across " +
                  s"${row.getAs[Long]("overflow_buckets")} hot buckets " +
                  s"(max bucket size ${row.getAs[Long]("max_bucket_size")})")
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
      })
      spark.conf.set(flag, "true")
    }
  }
}
