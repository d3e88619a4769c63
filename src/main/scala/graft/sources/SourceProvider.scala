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

/** Fixed-width text source — the layout mainframe/legacy-billing exports
  * still arrive in (no delimiter, each column a byte range). The column
  * spec rides the options map: `fields = "name:width,name:width,…"`,
  * columns LEFT-aligned and right-space-padded (the COBOL PIC X
  * convention); values come back as RTRIMmed strings and downstream
  * conform/cast (O4–O6) types them, exactly like the CSV path. Parsing is
  * pure `substring` arithmetic over Spark's `text` datasource — one
  * codegen'd projection per file scan, no per-row UDF, splittable and
  * column-prunable like any text scan.
  */
object FixedWidthSource extends SourceProvider {
  val name = "fixedwidth"
  def load(spark: SparkSession, path: String, options: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, rtrim, substring}
    val spec = options.getOrElse("fields", throw new IllegalArgumentException(
      "fixedwidth source needs options(\"fields\") = \"name:width,…\""))
    val fields = spec.split(",").map { f =>
      f.split(":") match {
        case Array(n, w) if w.trim.forall(_.isDigit) && w.trim.toInt > 0 =>
          (n.trim.toLowerCase, w.trim.toInt)
        case _ => throw new IllegalArgumentException(
          s"bad fixedwidth field spec '$f' (want name:width, width > 0)")
      }
    }
    require(fields.nonEmpty, "fixedwidth source needs at least one field")
    val raw = spark.read.text(path)
    val offsets = fields.scanLeft(1) { case (pos, (_, w)) => pos + w }
    val cols = fields.zip(offsets).map { case ((n, w), pos) =>
      rtrim(substring(col("value"), pos, w)).as(n)
    }
    raw.select(cols.toIndexedSeq: _*)
  }
}

/** Name → provider registry. The reference resolves sources reflectively from
  * `config.ini` (`/root/reference/load_postgres_from_spark_df.py:177-196`) and
  * ships a registry/class mismatch that makes reflective lookup fail; a plain
  * Scala map gives the same dispatch with compile-time safety.
  */
object SourceRegistry {
  val all: Map[String, SourceProvider] =
    Seq(CsvSource, ParquetSource, JsonSource, OrcSource, JdbcSource, AvroSource,
        FixedWidthSource)
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
