package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.schema.SchemaConform

/** Pluggable source contract — the reference's `GetSourceDataAsDf` ABC
  * (`/root/reference/get_source_data_as_df.py:10-17`) re-expressed as a Scala
  * trait. Every provider returns a lazy DataFrame with lower-cased column
  * names (the reference normalizes at the source,
  * `/root/reference/get_s3_data_as_df.py:41-43,52-54`).
  */
trait SourceProvider extends Serializable {
  def name: String
  def load(spark: SparkSession, path: String, options: Map[String, String] = Map.empty): DataFrame
}

/** CSV source (the reference's `_spark_read_csv_from_s3`,
  * `/root/reference/get_s3_data_as_df.py:33-43`). Uses Spark's builtin `csv`
  * reader — the reference's legacy `com.databricks.spark.csv` name is one of
  * its catalogued defects. Options (header, inferSchema, delimiter, …) pass
  * straight through.
  */
object CsvSource extends SourceProvider {
  val name = "csv"
  def load(spark: SparkSession, path: String, options: Map[String, String]): DataFrame =
    SchemaConform.lowercaseColumns(spark.read.options(options).csv(path))
}

/** Parquet source (`/root/reference/get_s3_data_as_df.py:45-54`). */
object ParquetSource extends SourceProvider {
  val name = "parquet"
  def load(spark: SparkSession, path: String, options: Map[String, String]): DataFrame =
    SchemaConform.lowercaseColumns(spark.read.options(options).parquet(path))
}

/** JSON-lines source — free capability from `org.apache.spark.sql`. */
object JsonSource extends SourceProvider {
  val name = "json"
  def load(spark: SparkSession, path: String, options: Map[String, String]): DataFrame =
    SchemaConform.lowercaseColumns(spark.read.options(options).json(path))
}

/** ORC source — the other columnar lake format Spark ships natively
  * (vectorized reader, predicate pushdown, column pruning — same scan
  * machinery as parquet). Completes the registry so a reference user whose
  * lake mixes parquet and ORC partitions needs no second tool.
  */
object OrcSource extends SourceProvider {
  val name = "orc"
  def load(spark: SparkSession, path: String, options: Map[String, String]): DataFrame =
    SchemaConform.lowercaseColumns(spark.read.options(options).orc(path))
}

/** JDBC (Postgres-as-source). The reference *declares* this source in its
  * registry (`/root/reference/config.ini:11-12`) but ships an empty file
  * (`/root/reference/get_pg_data_as_df.py`) — we implement it. `path` is the
  * table (or `(subquery) alias`); options must carry `url` and any
  * credentials. Partitioned reads via the standard `partitionColumn` /
  * `lowerBound` / `upperBound` / `numPartitions` options so a 100 TB-scale
  * pull parallelizes across executors instead of one connection.
  */
object JdbcSource extends SourceProvider {
  val name = "jdbc"
  def load(spark: SparkSession, path: String, options: Map[String, String]): DataFrame =
    SchemaConform.lowercaseColumns(
      spark.read.format("jdbc").options(options).option("dbtable", path).load())
}

/** Name → provider registry. The reference resolves sources reflectively from
  * `config.ini` (`/root/reference/load_postgres_from_spark_df.py:177-196`) and
  * ships a registry/class mismatch that makes reflective lookup fail; a plain
  * Scala map gives the same dispatch with compile-time safety.
  */
object SourceRegistry {
  val all: Map[String, SourceProvider] =
    Seq(CsvSource, ParquetSource, JsonSource, OrcSource, JdbcSource, AvroSource)
      .map(p => p.name -> p).toMap
  // Aliases mirroring the reference's config section names (config.ini:8-12).
  private val aliases = Map("s3" -> "parquet", "s3_csv" -> "csv", "s3_parquet" -> "parquet", "pg" -> "jdbc")

  def apply(name: String): SourceProvider = {
    val key = name.toLowerCase
    all.getOrElse(aliases.getOrElse(key, key),
      throw new IllegalArgumentException(
        s"Unknown source '$name'; available: ${(all.keys ++ aliases.keys).toSeq.sorted.mkString(", ")}"))
  }
}
