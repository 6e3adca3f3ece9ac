package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark pipeline plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL the driver hash-compares against.
  *
  * Contract (driver): column names must match between `fn`'s result and
  * the oracle; every query ends in a total-order ORDER BY; float outputs
  * are rounded or avoided (rank-only outputs) so cross-engine summation
  * order can't flip the hash.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
