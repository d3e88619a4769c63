package graft.sink

import java.sql.{Connection, DriverManager, PreparedStatement, Savepoint}

/** Minimal transactional-connection surface the sink needs. Isolating it
  * behind a trait (instead of raw `java.sql.Connection`) keeps the
  * savepoint + binary-split logic unit-testable against an in-memory fake —
  * the harness has no live Postgres (SURVEY.md §7.5 risk 2).
  */
trait SinkConnection extends AutoCloseable {
  /** Execute `sql` once per row of `batch` inside the current transaction.
    * Throws on any failure (the whole batch is then considered failed).
    */
  def executeBatch(sql: String, batch: Seq[Seq[Any]]): Unit
  def savepoint(name: String): Unit
  def rollbackTo(name: String): Unit
  def release(name: String): Unit
  def commit(): Unit
  def close(): Unit
}

/** Serializable factory shipped inside the executor closure — one connection
  * per partition, opened lazily on the first row (reference
  * `/root/reference/psycopg2_database_helper.py:152-154`).
  */
trait ConnectionFactory extends Serializable {
  def connect(): SinkConnection
}

/** Real JDBC backend. `reWriteBatchedInserts=true` makes the Postgres driver
  * collapse a JDBC batch into multi-row INSERTs — the moral equivalent of
  * psycopg2's `execute_values` page batching
  * (`/root/reference/psycopg2_database_helper.py:89-90`).
  */
final case class JdbcConnectionFactory(
    url: String,
    user: String,
    password: String,
    properties: Map[String, String] = Map("reWriteBatchedInserts" -> "true"))
  extends ConnectionFactory {

  def connect(): SinkConnection = new JdbcSinkConnection(rawConnection())

  /** Plain JDBC connection with the same credentials — shared with
    * [[graft.meta.JdbcPgCatalog]] so catalog reads and the sink configure
    * one set of credentials (reference `database_credentials`,
    * `/root/reference/load_postgres_from_spark_df.py:67-70`).
    */
  def rawConnection(): Connection = {
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    props.setProperty("user", user)
    props.setProperty("password", password)
    DriverManager.getConnection(url, props)
  }
}

final class JdbcSinkConnection(conn: Connection) extends SinkConnection {
  conn.setAutoCommit(false)
  private var savepoints = Map.empty[String, Savepoint]
  // One PreparedStatement per SQL text for the connection's lifetime: the
  // sink sends the same upsert thousands of times per partition, and
  // re-preparing each batch would re-plan it server-side every round trip.
  private var statements = Map.empty[String, PreparedStatement]

  private def statementFor(sql: String): PreparedStatement =
    statements.getOrElse(sql, {
      val ps = conn.prepareStatement(sql)
      statements += sql -> ps
      ps
    })

  def executeBatch(sql: String, batch: Seq[Seq[Any]]): Unit = {
    val ps = statementFor(sql)
    // The statement is shared across batches, so ANY failure — including a
    // setObject/addBatch throw mid-build — must clear partially-added rows,
    // or the binary-split retry would re-execute them alongside its halves.
    try {
      batch.foreach { row =>
        var i = 0
        while (i < row.length) { ps.setObject(i + 1, row(i)); i += 1 }
        ps.addBatch()
      }
      ps.executeBatch()
      ()
    } catch { case e: Throwable =>
      try ps.clearBatch() catch { case _: Throwable => () }
      throw e
    }
  }

  def savepoint(name: String): Unit = savepoints += name -> conn.setSavepoint(name)
  def rollbackTo(name: String): Unit = savepoints.get(name).foreach(conn.rollback)
  def release(name: String): Unit = {
    savepoints.get(name).foreach(conn.releaseSavepoint)
    savepoints -= name
  }
  def commit(): Unit = conn.commit()
  def close(): Unit = {
    statements.valuesIterator.foreach { ps =>
      try ps.close() catch { case _: Throwable => () }
    }
    conn.close()
  }
}
