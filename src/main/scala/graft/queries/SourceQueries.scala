package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.sources.{CsvSource, JsonSource}

/** Source-operator coverage: drives the CSV scan (reference O1,
  * `/root/reference/get_s3_data_as_df.py:33-43`) end-to-end through the
  * oracle gate. The query materializes a fixture table to CSV once per
  * (sf, table) and reads it back through [[graft.sources.CsvSource]] — the
  * oracle reads the original parquet, so any CSV round-trip defect
  * (quoting, header, type parse) fails the hash compare.
  */
object SourceQueries extends QueryDomain {

  // One CSV materialization per (sf, table) per JVM, under a per-process
  // unique path: repeated invocations (Bench warm-up + timed run) measure
  // the scan, not the fixture write, and concurrent sessions can't race on
  // a shared tmpdir target.
  private val materialized =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  private def csvRoundTrip(s: SparkSession, dir: String, table: String): DataFrame = {
    val path = materialized.getOrElseUpdate((dir, s"csv_$table"), {
      val p = stagePath(dir, "csv", table)
      t(s, dir, table).write.mode("overwrite").option("header", "true").csv(p)
      p
    })
    CsvSource.load(s, path, Map("header" -> "true"))
  }

  private def jsonRoundTrip(s: SparkSession, dir: String, table: String): DataFrame = {
    val path = materialized.getOrElseUpdate((dir, s"json_$table"), {
      val p = stagePath(dir, "json", table)
      t(s, dir, table).write.mode("overwrite").json(p)
      p
    })
    JsonSource.load(s, path, Map.empty)
  }

  private def stagePath(dir: String, fmt: String, table: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_${fmt}_" +
      s"${ProcessHandle.current().pid()}_${tag}_$table"
    cleanupOnExit(p)
    p
  }

  // pid-unique staging dirs would otherwise accumulate across JVM runs.
  private def cleanupOnExit(path: String): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(path))
    }))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_csv_source" -> { (s, dir) =>
      import s.implicits._
      // Nation through CSV: ints survive an explicit cast-back, strings are
      // header/quote-safe; joined to region (parquet) to prove the scan
      // composes with the relational surface.
      val n = csvRoundTrip(s, dir, "nation").select(
        $"n_nationkey".cast("int").as("n_nationkey"),
        $"n_name", $"n_regionkey".cast("int").as("n_regionkey"))
      n.join(t(s, dir, "region"), $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name", $"r_name")
        .orderBy($"n_nationkey")
    },

    "q_json_source" -> { (s, dir) =>
      import s.implicits._
      // Supplier through JSON-lines (self-describing types survive without
      // casts, unlike CSV) aggregated per nation — proves the JSON scan
      // composes with the relational surface.
      jsonRoundTrip(s, dir, "supplier")
        .groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n_suppliers"), dsum($"s_acctbal").as("total_bal"))
        .select($"s_nationkey".cast("int").as("s_nationkey"), $"n_suppliers", $"total_bal")
        .orderBy($"s_nationkey")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_csv_source" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "q_json_source" ->
      """SELECT s_nationkey, COUNT(*) AS n_suppliers,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
        |FROM supplier
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin
  )
}
