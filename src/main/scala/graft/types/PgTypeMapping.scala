package graft.types

import org.apache.spark.sql.types._

/** Postgres catalog type name → Spark `DataType`.
  *
  * Re-expresses the reference's config-driven mapping
  * (`/root/reference/config.ini:14-25`) plus its `numeric(p,s)` typmod rule
  * (`/root/reference/load_postgres_from_spark_df.py:155-156`, which
  * string-rewrites `format_type` output) as a real parser. Unknown types fall
  * back to `StringType`, matching the reference's `.get(t, "string")` default
  * (`/root/reference/load_postgres_from_spark_df.py:154`).
  */
object PgTypeMapping {

  private val NumericTypmod = """(?:numeric|decimal)\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)""".r

  /** Parse one Postgres type name (as produced by `atttypid::regtype` or
    * `format_type(atttypid, atttypmod)`) into a Spark type.
    */
  def toSparkType(pgType: String): DataType = pgType.trim.toLowerCase match {
    case NumericTypmod(p, s)                     => DecimalType(p.toInt, Option(s).map(_.toInt).getOrElse(0))
    case "numeric" | "decimal"                   => DecimalType(10, 0)
    case "integer" | "int" | "int4" | "serial"   => IntegerType
    case "smallint" | "int2" | "smallserial"     => ShortType
    case "bigint" | "int8" | "bigserial"         => LongType
    case "date"                                  => DateType
    case t if t.startsWith("timestamp")          => TimestampType
    case "double" | "double precision" | "float8" => DoubleType
    case "float" | "real" | "float4"             => FloatType
    case "boolean" | "bool"                      => BooleanType
    case "bytea"                                 => BinaryType
    case _                                       => StringType
  }

  /** Map a full catalog column listing `(name, typeWithTypmod)` to a Spark
    * schema, preserving catalog (attnum) order.
    */
  def toStructType(columns: Seq[(String, String)]): StructType =
    StructType(columns.map { case (n, t) => StructField(n, toSparkType(t)) })
}
