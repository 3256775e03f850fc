package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded engine capability: a named DataFrame pipeline plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Determinism contract (FIXTURES.md "Oracle-determinism rule"): every
  * oracled query ends in a total-order sort and rounds floating aggregates
  * at the final projection, and column names match the oracle exactly.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object GraftQuery {
  /** Build the driver-contract maps from a collection of queries. */
  def toQueryMap(qs: Seq[GraftQuery]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap
  def toOracleMap(qs: Seq[GraftQuery]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
