package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named group of driver-checkable queries (SparkEntry aggregates all
  * domains). `oracleSql` keys must be a subset of `queries` keys; queries
  * without an oracle get the driver's weaker rows-only check.
  */
trait QueryDomain {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
