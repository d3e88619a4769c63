package graft.meta

import scala.collection.immutable.ListMap

/** Target-table metadata discovery — the reference's three `pg_catalog`
  * queries (`/root/reference/sql.py`) behind a trait so offline tests can
  * substitute a static catalog (the harness has no live Postgres).
  */
trait PgCatalog {
  /** (column name → type-with-typmod), in attnum order
    * (`/root/reference/sql.py:2-24`,
    * `/root/reference/load_postgres_from_spark_df.py:107-125`).
    */
  def columnTypes(schema: String, table: String): ListMap[String, String]

  /** Unique key for upsert routing: primary key first
    * (`/root/reference/sql.py:26-47`), else the first unique non-PK index
    * (`/root/reference/sql.py:49-80`), else None → insert-only mode
    * (`/root/reference/load_postgres_from_spark_df.py:198-224`).
    */
  def uniqueKey(schema: String, table: String): Option[Seq[String]]
}

/** Live implementation over any JDBC connection provider. The SQL texts are
  * semantically the reference's catalog queries re-issued over JDBC.
  */
final class JdbcPgCatalog(connect: () => java.sql.Connection) extends PgCatalog {

  /** Ad-hoc driver-side query runner — the reference's `fetch_query_results`
    * (`/root/reference/psycopg2_database_helper.py:254-284`): run any SELECT,
    * fetch every row as a column-value sequence. Driver-side only — never
    * part of a distributed plan (use [[graft.sources.JdbcSource]] for that).
    */
  def fetchQueryResults(sql: String, args: Seq[String] = Nil): Vector[Vector[Any]] =
    query(sql, args) { rs =>
      val n = rs.getMetaData.getColumnCount
      Vector.tabulate(n)(i => rs.getObject(i + 1))
    }

  private def query[A](sql: String, args: Seq[String])(read: java.sql.ResultSet => A): Vector[A] = {
    val conn = connect()
    try {
      val ps = conn.prepareStatement(sql)
      try {
        args.zipWithIndex.foreach { case (a, i) => ps.setString(i + 1, a) }
        val rs = ps.executeQuery()
        val out = Vector.newBuilder[A]
        while (rs.next()) out += read(rs)
        out.result()
      } finally ps.close()
    } finally conn.close()
  }

  // Columns + types in attnum order (reference sql.py:2-24).
  private[graft] val columnSql =
    """SELECT a.attname AS column_name,
      |       format_type(a.atttypid, a.atttypmod) AS data_type
      |FROM pg_catalog.pg_attribute a
      |JOIN pg_catalog.pg_class c ON c.oid = a.attrelid
      |JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
      |WHERE a.attnum > 0 AND NOT a.attisdropped
      |  AND n.nspname = ? AND c.relname = ?
      |ORDER BY a.attnum""".stripMargin

  // Primary-key columns as an ordered comma-list (reference sql.py:26-47).
  private[graft] val pkSql =
    """SELECT string_agg(a.attname, ',' ORDER BY k.ord) AS key_cols
      |FROM pg_catalog.pg_index i
      |JOIN pg_catalog.pg_class c ON c.oid = i.indrelid
      |JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
      |CROSS JOIN LATERAL unnest(i.indkey) WITH ORDINALITY AS k(attnum, ord)
      |JOIN pg_catalog.pg_attribute a
      |  ON a.attrelid = c.oid AND a.attnum = k.attnum
      |WHERE i.indisprimary AND n.nspname = ? AND c.relname = ?
      |GROUP BY i.indexrelid""".stripMargin

  // First unique non-PK index (reference sql.py:49-80; LIMIT 1 semantics).
  // Excluded beyond the reference: partial indexes (indpred IS NULL — they
  // don't guarantee table-wide uniqueness, so ON CONFLICT (cols) would not
  // match them) and expression indexes (0 <> ALL(indkey) — an expression
  // "column" has attnum 0 and no attname to target).
  private[graft] val uniqueIdxSql =
    """SELECT key_cols FROM (
      |  SELECT string_agg(a.attname, ',' ORDER BY k.ord) AS key_cols,
      |         i.indexrelid
      |  FROM pg_catalog.pg_index i
      |  JOIN pg_catalog.pg_class c ON c.oid = i.indrelid
      |  JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
      |  CROSS JOIN LATERAL unnest(i.indkey) WITH ORDINALITY AS k(attnum, ord)
      |  JOIN pg_catalog.pg_attribute a
      |    ON a.attrelid = c.oid AND a.attnum = k.attnum
      |  WHERE i.indisunique AND NOT i.indisprimary
      |    AND i.indpred IS NULL AND 0 <> ALL(i.indkey)
      |    AND n.nspname = ? AND c.relname = ?
      |  GROUP BY i.indexrelid
      |) u ORDER BY indexrelid LIMIT 1""".stripMargin

  def columnTypes(schema: String, table: String): ListMap[String, String] =
    ListMap(query(columnSql, Seq(schema, table))(rs => rs.getString(1) -> rs.getString(2)): _*)

  def uniqueKey(schema: String, table: String): Option[Seq[String]] = {
    def keyOf(sql: String): Option[Seq[String]] =
      query(sql, Seq(schema, table))(_.getString(1)).headOption
        .map(_.split(',').toIndexedSeq)
    keyOf(pkSql).orElse(keyOf(uniqueIdxSql))
  }
}

/** Offline catalog for tests and for driving [[graft.schema.SchemaConform]]
  * without a database.
  */
final case class StaticCatalog(
    columns: ListMap[String, String],
    key: Option[Seq[String]]) extends PgCatalog {
  def columnTypes(schema: String, table: String): ListMap[String, String] = columns
  def uniqueKey(schema: String, table: String): Option[Seq[String]] = key
}
