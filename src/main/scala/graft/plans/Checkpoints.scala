package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** localCheckpoint storage hygiene for iterative operators.
  *
  * `Dataset.localCheckpoint` materializes the frame into executor storage
  * blocks and truncates lineage — the right discipline for multi-round
  * trainers (ALS, boosting, BFS frontiers) whose plans would otherwise grow
  * per round. But those blocks are NOT freed by `Dataset.unpersist()`:
  * that call only clears CacheManager entries created by `persist()/cache()`,
  * while checkpoint blocks live on the underlying RDD. Left alone they pin
  * executor memory for the life of the session — across a 382-query bench
  * run (or a long-running cluster job) the leak compounds into GC pressure
  * that made round 9's driver bench run q336 20× slower than the sealed run.
  *
  * Two remedies, both used:
  *   - [[free]]: inside a round loop, free the SUPERSEDED round's blocks as
  *     soon as the next round's checkpoint has materialized (eager
  *     `localCheckpoint(true)` makes the ordering safe — lineage is cut, so
  *     freeing before the consumer materializes would be unrecoverable).
  *   - [[freeAll]]: between independent queries (Bench/Verify loops), drop
  *     every persisted RDD in the session. Queries rebuild their frames from
  *     parquet on each invocation, so nothing legitimate is lost.
  */
object Checkpoints {

  /** Free the executor-storage blocks behind a localCheckpoint'ed frame.
    * No-op on frames that are not ROOT-checkpoint-backed: only the frame
    * returned by `localCheckpoint` itself (plan = a single LogicalRDD) is
    * freed. A lazily composed frame (projection/join OVER a checkpoint)
    * is deliberately rejected — collecting every LogicalRDD under it
    * would unpersist still-shared blocks (e.g. a common edge frame) whose
    * lineage is already truncated: an unrecoverable "checkpoint block not
    * found" at the next consumer. Only call once every consumer of `df`
    * has been MATERIALIZED (collected, written, or eagerly
    * re-checkpointed) — lost blocks cannot be recomputed. */
  def free(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Free EVERY persisted RDD in the session — the between-queries sweep so
    * one query's checkpoint blocks can never build memory pressure for the
    * next. Safe between independent query invocations only. */
  def freeAll(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
}
