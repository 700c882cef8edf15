package graft.model

import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{ColumnDefinition, CreateTable}

/** Schema model from CREATE TABLE DDL text (reference
  * `model_from_create_commands`, dqo/db/clients/postgres.py:514-539 — the
  * reference version is bitrotted; this one parses with Catalyst's real
  * SQL grammar instead of token-splitting, so quoted identifiers, scale
  * arguments, and constraints all work).
  *
  * Stats are absent (`ColumnStats` = None) — a DDL-born model answers
  * schema/type questions (generation, validity, encoding shapes) until
  * `StatsCollector.collect` hydrates a measured one.
  */
object DdlModel {

  /** Parse every CREATE TABLE statement in `ddl` (semicolon-separated,
    * other statements ignored) into a stats-less [[DbModel]].
    */
  def fromCreateCommands(ddl: String): DbModel = {
    val statements = ddl.split(";").map(_.trim).filter(_.nonEmpty)
    val tables = statements.flatMap { stmt =>
      scala.util.Try(CatalystSqlParser.parsePlan(stmt)).toOption.collect {
        case ct: CreateTable =>
          val name = ct.name match {
            case u: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
              u.nameParts.last
            case other => other.toString
          }
          val cols = ct.columns.collect {
            case cd: ColumnDefinition =>
              DType.fromSpark(normalize(cd.dataType))
                .map(t => ColumnModel(cd.name, t, None))
          }.flatten
          TableModel(name, cols, None)
      }
    }
    DbModel(tables.toSeq)
  }

  /** char/varchar carry length args Catalyst keeps as distinct types;
    * the five-type model sees them all as strings.
    */
  private def normalize(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case _: org.apache.spark.sql.types.VarcharType |
         _: org.apache.spark.sql.types.CharType =>
      org.apache.spark.sql.types.StringType
    case other => other
  }
}
