package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Cluster deployment path: `--conf spark.sql.extensions=graft.GraftExtensions`
  * injects every engine function at session build time — the Spark-native
  * equivalent of the reference's `ADD JAR` + `CREATE TEMPORARY FUNCTION`
  * deployment (README.markdown:5), with no application code changes.
  * Interactive/apps can keep using [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.sqlFunctions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
    // the engine's custom physical operators (whole-operator tier):
    // plans AsOfJoinNode -> AsOfJoinExec; a no-op on every other plan
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
