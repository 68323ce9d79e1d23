package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{
  And => CAnd, Attribute, Contains, EndsWith, EqualNullSafe => CEqualNullSafe,
  EqualTo => CEqualTo, Expression, GreaterThan => CGreaterThan,
  GreaterThanOrEqual => CGreaterThanOrEqual, In => CIn, InSet, IsNotNull => CIsNotNull,
  IsNull => CIsNull, LessThan => CLessThan, LessThanOrEqual => CLessThanOrEqual,
  Literal, Not => CNot, Or => COr, StartsWith}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.sources._

/** SQL-text surface for row-level UPDATE
  * ([[graft.engine.EsdbWriter.updateWhere]]): parse the assignment list
  * and predicate with Spark's own UPDATE grammar, resolve the predicate
  * against the store's schema, and hand the engine (a) the assignments
  * as Columns and (b) the predicate as data-source Filters for footer-
  * stats file targeting. Exposed as `CALL cat.system.update_where(...)`
  * ([[EsdbProcedures]]) — the redaction half of GDPR next to SQL
  * `DELETE FROM`. Shapes the Filter algebra can't express refuse at
  * analysis (same rigor as SQL DELETE) rather than silently rewriting
  * the whole store.
  */
object UpdateSql {

  /** Run `UPDATE <store at path> SET <setSql> WHERE <whereSql>`.
    * Returns false when footer stats proved the update a no-op
    * (no version published).
    */
  def updateWhere(spark: SparkSession, path: String,
                  setSql: String, whereSql: String,
                  keepVersions: Int = 1): Boolean = {
    val parsed = spark.sessionState.sqlParser.parsePlan(
      s"UPDATE __esdb_update_target SET $setSql WHERE $whereSql")
    val assignments = parsed match {
      case u: logical.UpdateTable => u.assignments
      case other => throw new IllegalArgumentException(
        s"not an UPDATE shape: SET $setSql WHERE $whereSql ($other)")
    }
    val set: Map[String, Column] = assignments.map { a =>
      val name = a.key match {
        case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => ua.name
        case other => other.sql
      }
      name -> expr(a.value.sql)
    }.toMap
    val df = spark.read.format("esdb").load(path)
    val filters = translate(df, expr(whereSql), whereSql)
    graft.engine.EsdbWriter.updateWhere(spark, path, set, filters, keepVersions)
  }

  /** Resolve `cond` against `df`, fold constant subtrees (the analyzer
    * leaves `1000 * 1000` and literal casts unfolded), split the
    * conjunction, and translate each member to a data-source Filter —
    * throwing on any member the Filter algebra can't express.
    */
  private[graft] def translate(df: DataFrame, cond: Column,
                               shown: String): Seq[Filter] = {
    val analyzed = df.filter(cond).queryExecution.analyzed
    val resolved = analyzed.collectFirst { case f: logical.Filter => f.condition }
      .getOrElse(throw new IllegalArgumentException(
        s"cannot resolve UPDATE predicate: $shown"))
    val folded = resolved.transformUp {
      // foldable-yet-Unevaluable expressions exist at analysis time
      // (current_date()/current_timestamp() are substituted only by the
      // optimizer): leave them unfolded so toSourceFilter refuses them
      // with the intended IllegalArgumentException, not an internal
      // UnsupportedOperationException out of eval()
      case e if e.foldable && !e.isInstanceOf[Literal] &&
          !e.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Unevaluable]) =>
        try Literal.create(e.eval(null), e.dataType)
        catch { case _: RuntimeException | _: UnsupportedOperationException => e }
    }
    def split(e: Expression): Seq[Expression] = e match {
      case CAnd(l, r) => split(l) ++ split(r)
      case x => Seq(x)
    }
    split(folded).map { c =>
      toSourceFilter(c).getOrElse(throw new IllegalArgumentException(
        s"UPDATE predicate not expressible as a data-source filter: ${c.sql}"))
    }
  }

  private def scalaVal(l: Literal): Any =
    CatalystTypeConverters.convertToScala(l.value, l.dataType)

  /** Resolved Catalyst predicate → `sources.Filter`, the exact dual of
    * [[graft.engine.DeleteWhere.translate]]: only the shapes that
    * prover understands, with literal values converted to their
    * external (Row-facing) representation. None = not expressible.
    */
  private[graft] def toSourceFilter(e: Expression): Option[Filter] = e match {
    case CEqualTo(a: Attribute, l: Literal) => Some(EqualTo(a.name, scalaVal(l)))
    case CEqualTo(l: Literal, a: Attribute) => Some(EqualTo(a.name, scalaVal(l)))
    case CEqualNullSafe(a: Attribute, l: Literal) => Some(EqualNullSafe(a.name, scalaVal(l)))
    case CEqualNullSafe(l: Literal, a: Attribute) => Some(EqualNullSafe(a.name, scalaVal(l)))
    case CGreaterThan(a: Attribute, l: Literal) => Some(GreaterThan(a.name, scalaVal(l)))
    case CGreaterThan(l: Literal, a: Attribute) => Some(LessThan(a.name, scalaVal(l)))
    case CGreaterThanOrEqual(a: Attribute, l: Literal) => Some(GreaterThanOrEqual(a.name, scalaVal(l)))
    case CGreaterThanOrEqual(l: Literal, a: Attribute) => Some(LessThanOrEqual(a.name, scalaVal(l)))
    case CLessThan(a: Attribute, l: Literal) => Some(LessThan(a.name, scalaVal(l)))
    case CLessThan(l: Literal, a: Attribute) => Some(GreaterThan(a.name, scalaVal(l)))
    case CLessThanOrEqual(a: Attribute, l: Literal) => Some(LessThanOrEqual(a.name, scalaVal(l)))
    case CLessThanOrEqual(l: Literal, a: Attribute) => Some(GreaterThanOrEqual(a.name, scalaVal(l)))
    case CIn(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      Some(In(a.name, vs.map(v => scalaVal(v.asInstanceOf[Literal])).toArray))
    case InSet(a: Attribute, vs) =>
      Some(In(a.name, vs.map(v =>
        CatalystTypeConverters.convertToScala(v, a.dataType)).toArray))
    case CIsNull(a: Attribute) => Some(IsNull(a.name))
    case CIsNotNull(a: Attribute) => Some(IsNotNull(a.name))
    case StartsWith(a: Attribute, Literal(v, _)) if v != null =>
      Some(StringStartsWith(a.name, v.toString))
    case EndsWith(a: Attribute, Literal(v, _)) if v != null =>
      Some(StringEndsWith(a.name, v.toString))
    case Contains(a: Attribute, Literal(v, _)) if v != null =>
      Some(StringContains(a.name, v.toString))
    case CAnd(l, r) =>
      for { lf <- toSourceFilter(l); rf <- toSourceFilter(r) } yield And(lf, rf)
    case COr(l, r) =>
      for { lf <- toSourceFilter(l); rf <- toSourceFilter(r) } yield Or(lf, rf)
    case CNot(c) => toSourceFilter(c).map(Not)
    case Literal(true, org.apache.spark.sql.types.BooleanType) => Some(AlwaysTrue)
    case Literal(false, org.apache.spark.sql.types.BooleanType) => Some(AlwaysFalse)
    case _ => None
  }
}
