package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.IntegerType

/** SQL DML front door for lake tables (r15 verdict #5) — the
  * Delta-parity surface a SQL-only consumer hits first:
  *
  * {{{
  *   GraftCatalog.registerLake(spark, "t", dir)   // records name → dir
  *   spark.sql("DELETE FROM t WHERE dt = '2024-01-01'")
  *   spark.sql("UPDATE t SET score = score + 1 WHERE flagged")
  * }}}
  *
  * Spark's parser already produces [[DeleteFromTable]]/[[UpdateTable]]
  * for these statements; for anything that is not a DSv2 table,
  * analysis then fails with "only supported with v2 tables". The
  * resolution rule below intercepts exactly the statements whose
  * target is a registered lake view and rewrites them onto the lake's
  * own mutation verbs — [[graft.sources.LakeMerge.deleteWhere]]
  * (merge-on-read deletion vectors) and
  * [[graft.sources.LakeMerge.updateWhere]] (copy-on-write re-merge) —
  * so CHECK-constraint vetoes, the CDC feed, txn watermarks, and
  * snapshot history behave identically to the Scala API. Statements
  * over names that are NOT registered lake tables pass through
  * untouched and keep Spark's own error surface.
  *
  * The target view may already be resolved by the time the rule runs
  * (temp views resolve in the same fixed-point batch), so conditions
  * and assignment values can carry `AttributeReference`s bound to the
  * REGISTRATION-TIME snapshot plan. The commands re-read the table at
  * execution time, so those bindings are stripped back to unresolved
  * name lookups and re-resolve against the fresh snapshot — name-based
  * semantics, exactly what SQL DML means.
  */
object LakeDml {

  /** Analyzer rule: rewrite DELETE/UPDATE over registered lake views
    * onto runnable lake commands. Injected via
    * `GraftExtensions` → `injectResolutionRule`.
    */
  case class ResolveLakeDml(session: SparkSession)
      extends Rule[LogicalPlan] {

    private def lakeTarget(t: LogicalPlan): Option[(String, String)] =
      t match {
        case UnresolvedRelation(parts, _, _) if parts.length == 1 =>
          graft.GraftCatalog.lakeDir(session, parts.head)
            .map(parts.head -> _)
        // a temp view resolves to SubqueryAlias(name, <snapshot plan>)
        // within the same fixed-point batch — match it by name too
        case SubqueryAlias(ident, _) =>
          graft.GraftCatalog.lakeDir(session, ident.name)
            .map(ident.name -> _)
        case _ => None
      }

    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      case DeleteFromTable(t, cond) =>
        lakeTarget(t) match {
          case Some((name, dir)) =>
            GraftDeleteFromLakeCommand(name, dir, unresolve(cond))
          case None => plan
        }
      case UpdateTable(t, assignments, cond) =>
        lakeTarget(t) match {
          case Some((name, dir)) =>
            val set = assignments.map { a =>
              val key = a.key match {
                case ar: AttributeReference => ar.name
                case ua: UnresolvedAttribute => ua.nameParts.last
                case other => other.sql.stripPrefix("`").stripSuffix("`")
              }
              key -> unresolve(a.value)
            }
            GraftUpdateLakeCommand(name, dir, set,
              cond.map(unresolve))
          case None => plan
        }
      case _ => plan
    }
  }

  /** Strip registration-time attribute bindings back to name lookups
    * so the expression re-resolves against the execution-time
    * snapshot read.
    */
  private def unresolve(e: Expression): ExprBox = new ExprBox(e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  })

  /** Opaque expression holder: the commands carry DELIBERATELY
    * unresolved expressions (they re-resolve against the fresh
    * snapshot at run time), but checkAnalysis collects every
    * `Expression`-typed field of a command and fails on unresolved
    * attributes — boxing hides the expression from that traversal
    * while keeping it fully structured (no SQL-string round trip).
    */
  final class ExprBox(val e: Expression) extends Serializable {
    override def toString: String = e.sql
  }

  private def out(name: String): Seq[Attribute] =
    Seq(AttributeReference(name, IntegerType, nullable = false)())

  /** `DELETE FROM <lake view> WHERE <cond>` — merge-on-read delete via
    * [[graft.sources.LakeMerge.deleteWhere]]; re-registers the views
    * afterwards so subsequent SQL reads the new snapshot (registered
    * views are snapshot-frozen by contract). Returns the new version.
    */
  case class GraftDeleteFromLakeCommand(name: String, dir: String,
      cond: ExprBox) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = out("version")
    override def run(spark: SparkSession): Seq[Row] = {
      val v = graft.sources.LakeMerge.deleteWhere(spark, dir,
        GraftColumnBridge.column(cond.e))
      graft.GraftCatalog.registerLake(spark, name, dir)
      Seq(Row(v))
    }
  }

  /** `UPDATE <lake view> SET ... WHERE ...` — copy-on-write re-merge
    * via [[graft.sources.LakeMerge.updateWhere]] (constraint vetoes
    * and CDC included); re-registers the views afterwards. Returns
    * the new version.
    */
  case class GraftUpdateLakeCommand(name: String, dir: String,
      set: Seq[(String, ExprBox)], cond: Option[ExprBox])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = out("version")
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.lit
      val v = graft.sources.LakeMerge.updateWhere(spark, dir,
        set.map { case (c, b) => c -> GraftColumnBridge.column(b.e) },
        cond.map(b => GraftColumnBridge.column(b.e)).getOrElse(lit(true)))
      graft.GraftCatalog.registerLake(spark, name, dir)
      Seq(Row(v))
    }
  }
}
