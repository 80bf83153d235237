package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, AttributeSet, EqualTo, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Foreign-key join elimination: drop a dimension join entirely when the
  * query uses no dimension columns and declared constraints make the join
  * a no-op on the fact rows.
  *
  * The warehouse-standard optimization (Snowflake/Trino's RELY'd
  * constraints): BI tools emit star joins unconditionally, and most
  * dashboards then aggregate only fact columns. With
  *
  *  - a LEFT OUTER join: the dim key's declared UNIQUENESS alone makes the
  *    join row-preserving (each fact row appears exactly once, matched or
  *    not), so it can always be dropped;
  *  - an INNER join: additionally the fk must be declared non-null and
  *    referentially intact (every fact fk has a dim match) — declared per
  *    fk column name in [[JoinElimination.FkConstraint]].
  *
  * The rule fires only when the join's parent (Project or Aggregate — the
  * shapes the optimizer leaves after column pruning) references nothing
  * from the dim side, the join condition is a single fk = pk equality, and
  * the dim side is a bare (possibly column-pruned) scan of the registered
  * dimension path with NO intermediate Filter (a dim filter makes the join
  * selective — never eliminable). At 100 TB this turns a
  * fact-scale shuffle (or at best a broadcast probe over every fact row)
  * into nothing.
  *
  * Constraints are DECLARED, not verified at plan time — exactly like
  * RELY constraints; the declaration is the deployment's promise, and the
  * declared query's oracle (which executes the join) is what holds this
  * engine's registration honest in CI.
  */
object JoinElimination {

  /** A declared dimension: its scan path, unique key, and the fact fk
    * column names with declared non-null + referential integrity (these
    * enable INNER elimination; LEFT OUTER needs none). */
  final case class FkConstraint(dimPathSuffix: String, pkCol: String,
      riFkNames: Set[String])

  /** Install (or replace) the elimination rule for `constraints`. */
  def install(spark: SparkSession, constraints: Seq[FkConstraint]): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(
        _.isInstanceOf[FkJoinElimination]) :+ FkJoinElimination(constraints)
}

final case class FkJoinElimination(
    constraints: Seq[JoinElimination.FkConstraint])
    extends Rule[LogicalPlan] {

  /** Peel column-pruning Projects; succeed iff the leaf is a file scan of
    * `suffix` with no selective operator in between. The one filter shape
    * allowed is the optimizer's own null-intolerance residue,
    * `IsNotNull(pk)` (conjunctions thereof): under the declared RI the fk
    * only ever matches non-null pks, so it is not selective wrt the join. */
  private def isBareDimScan(plan: LogicalPlan, suffix: String,
      pk: AttributeReference): Boolean =
    plan match {
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        isBareDimScan(child, suffix, pk)
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child)
          if splitConjuncts(cond).forall {
            case org.apache.spark.sql.catalyst.expressions
              .IsNotNull(a: AttributeReference) => a.exprId == pk.exprId
            case _ => false
          } =>
        isBareDimScan(child, suffix, pk)
      case LogicalRelation(fs: HadoopFsRelation, _, _, false, _) =>
        fs.location.rootPaths.exists(_.toString.endsWith(suffix))
      case _ => false
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
      splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** If `join` is an eliminable fk→dim join given that the parent needs
    * only `required`, return the surviving fact side. */
  private def tryEliminate(join: Join,
      required: AttributeSet): Option[LogicalPlan] = join match {
    case Join(l, r, jt, Some(EqualTo(x: AttributeReference,
        y: AttributeReference)), _) if jt == Inner || jt == LeftOuter =>
      // orient: which side is the dim scan carrying the pk?
      val sides = Seq((l, r, x, y), (r, l, y, x)) // (fact, dim, fk, pk)
      sides.view.flatMap { case (fact, dim, fk, pk) =>
        constraints.find { c =>
          pk.name == c.pkCol &&
            dim.outputSet.contains(pk) && fact.outputSet.contains(fk) &&
            isBareDimScan(dim, c.dimPathSuffix, pk) &&
            required.subsetOf(fact.outputSet) &&
            (jt == LeftOuter || c.riFkNames.contains(fk.name)) &&
            // LeftOuter with dim on the left is a RIGHT outer wrt dim —
            // only the join's right side is eliminable for LeftOuter
            (jt != LeftOuter || (dim eq r))
        }.map(_ => fact)
      }.headOption
    case _ => None
  }

  private def refs(es: Seq[Expression]): AttributeSet =
    AttributeSet(es.flatMap(_.references))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(pl, j: Join) =>
      tryEliminate(j, refs(pl)) match {
        case Some(fact) => Project(pl, fact)
        case None => p
      }
    case a @ Aggregate(gs, aggs, j: Join, hint) =>
      tryEliminate(j, refs(gs ++ aggs)) match {
        case Some(fact) => Aggregate(gs, aggs, fact, hint)
        case None => a
      }
  }
}
