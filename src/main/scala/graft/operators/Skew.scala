package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew-mitigation for shuffle joins: salt the skewed (fact) side into
  * `nSalts` sub-keys and replicate the other side across all salts, so one
  * hot key spreads over `nSalts` reducers instead of one straggler task.
  *
  * Spark's AQE skew-join handles most cases at runtime (splitting oversized
  * partitions); this operator is for the pathological key — e.g. a null-ish
  * default id owning 10% of a 100 TB fact table — where pre-spreading beats
  * post-hoc splitting, and for engines/paths where AQE is off. Salt
  * assignment is round-robin per input partition position; which salt a row
  * gets never affects the join result, only its placement.
  */
object Skew {

  /** Inner/left join `fact ⋈ dim` on `key`, salting the fact side.
    * `dim` is replicated `nSalts`× — keep it the small side. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    val salted = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(nSalts.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
