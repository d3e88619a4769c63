package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared helpers for the query surface: fixture loading plus the
  * determinism conventions that keep Spark results hash-identical to the
  * DuckDB oracle (SURVEY.md §7.5 risk 1).
  */
object Tables {

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Exact-valued sum of a double column: route through a decimal so the
    * result is independent of partitioning/summation order (double addition
    * is not associative; decimal addition is), then cast back to double.
    * Oracle twin: `CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)`.
    */
  def dsum(c: Column, precision: Int = 18, scale: Int = 4): Column =
    sum(c.cast(DecimalType(precision, scale))).cast(DoubleType)

  /** Exact-valued average: decimal-exact sum and count, divided as doubles
    * (IEEE division of identical operands is identical across engines,
    * whereas decimal-division scale rules differ between Spark and DuckDB).
    * Oracle twin:
    * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(x) AS DOUBLE)`.
    */
  def davg(c: Column, precision: Int = 18, scale: Int = 4): Column =
    sum(c.cast(DecimalType(precision, scale))).cast(DoubleType) /
      count(c).cast(DoubleType)

  /** Decimal cast of a double for exact arithmetic mid-expression. */
  def dec(c: Column, precision: Int = 18, scale: Int = 4): Column =
    c.cast(DecimalType(precision, scale))
}
