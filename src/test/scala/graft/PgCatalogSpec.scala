package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement, ResultSet, ResultSetMetaData}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.ListMap
import graft.meta.{JdbcPgCatalog, StaticCatalog}

/** O7/O8/O15 against a stubbed JDBC connection: golden assertions on the
  * three catalog SQL texts, uniqueKey precedence (PK beats unique index),
  * composite-key split, and the ad-hoc query runner. A reflective proxy
  * stands in for the driver — the harness has no live Postgres.
  */
class PgCatalogSpec extends AnyFunSuite {

  /** Stub JDBC: routes prepareStatement(sql) to `data(sql)` rows; records
    * executed SQL and bound parameters.
    */
  final class StubDb(data: Map[String, Seq[Seq[Any]]]) {
    val executed = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
    var openConnections = 0

    private def proxy[T](cls: Class[T])(handle: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
      cls.cast(Proxy.newProxyInstance(cls.getClassLoader, Array(cls),
        new InvocationHandler {
          def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef = {
            val args = if (a == null) Array.empty[AnyRef] else a
            handle.applyOrElse((m.getName, args), { (_: (String, Array[AnyRef])) =>
              m.getReturnType match {
                case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
                case java.lang.Integer.TYPE => Integer.valueOf(0)
                case java.lang.Void.TYPE    => null
                case _                      => null
              }
            })
          }
        }))

    private def resultSet(rows: Seq[Seq[Any]]): ResultSet = {
      var idx = -1
      proxy(classOf[ResultSet]) {
        case ("next", _) =>
          idx += 1; java.lang.Boolean.valueOf(idx < rows.size)
        case ("getString", Array(i: Integer)) => String.valueOf(rows(idx)(i - 1))
        case ("getObject", Array(i: Integer)) => rows(idx)(i - 1).asInstanceOf[AnyRef]
        case ("getMetaData", _) =>
          proxy(classOf[ResultSetMetaData]) {
            case ("getColumnCount", _) =>
              Integer.valueOf(if (rows.isEmpty) 0 else rows.head.size)
          }
      }
    }

    def connect(): Connection = {
      openConnections += 1
      proxy(classOf[Connection]) {
        case ("prepareStatement", Array(sql: String)) =>
          val bound = scala.collection.mutable.ArrayBuffer.empty[String]
          proxy(classOf[PreparedStatement]) {
            case ("setString", Array(_: Integer, v: String)) => bound += v; null
            case ("executeQuery", _) =>
              executed += sql -> bound.toSeq
              resultSet(data.getOrElse(sql, Nil))
          }
        case ("close", _) => openConnections -= 1; null
      }
    }
  }

  private def catalogOver(db: StubDb) = new JdbcPgCatalog(() => db.connect())

  // Golden fragments: the load-bearing clauses of each rewritten sql.py query.
  test("columnSql golden shape (reference sql.py:2-24)") {
    val sql = catalogOver(new StubDb(Map.empty)).columnSql
    assert(sql.contains("format_type(a.atttypid, a.atttypmod)"))
    assert(sql.contains("a.attnum > 0 AND NOT a.attisdropped"))
    assert(sql.contains("ORDER BY a.attnum"))
    assert(sql.count(_ == '?') == 2)
  }

  test("pkSql golden shape (reference sql.py:26-47)") {
    val sql = catalogOver(new StubDb(Map.empty)).pkSql
    assert(sql.contains("i.indisprimary"))
    assert(sql.contains("string_agg(a.attname, ',' ORDER BY k.ord)"))
    assert(sql.contains("unnest(i.indkey) WITH ORDINALITY"))
  }

  test("uniqueIdxSql golden shape (reference sql.py:49-80 + hardening)") {
    val sql = catalogOver(new StubDb(Map.empty)).uniqueIdxSql
    assert(sql.contains("i.indisunique AND NOT i.indisprimary"))
    // partial and expression indexes cannot anchor ON CONFLICT upserts
    assert(sql.contains("i.indpred IS NULL"))
    assert(sql.contains("0 <> ALL(i.indkey)"))
    assert(sql.contains("LIMIT 1"))
  }

  test("columnTypes preserves attnum order and binds schema/table") {
    val db = new StubDb(Map(
      catalogOver(new StubDb(Map.empty)).columnSql -> Seq(
        Seq("id", "bigint"), Seq("amount", "numeric(12,2)"), Seq("note", "text"))))
    val cat = catalogOver(db)
    val cols = cat.columnTypes("public", "t1")
    assert(cols == ListMap("id" -> "bigint", "amount" -> "numeric(12,2)", "note" -> "text"))
    assert(db.executed == Seq(cat.columnSql -> Seq("public", "t1")))
    assert(db.openConnections == 0, "connection must be closed after the read")
  }

  test("uniqueKey: primary key wins, composite key splits on ','") {
    val template = catalogOver(new StubDb(Map.empty))
    val db = new StubDb(Map(
      template.pkSql -> Seq(Seq("a,b")),
      template.uniqueIdxSql -> Seq(Seq("should_not_be_used"))))
    assert(catalogOver(db).uniqueKey("s", "t") == Some(Seq("a", "b")))
    assert(db.executed.map(_._1) == Seq(template.pkSql), "unique-index query must not run when a PK exists")
  }

  test("uniqueKey: falls back to first unique index, then None") {
    val template = catalogOver(new StubDb(Map.empty))
    val db = new StubDb(Map(template.uniqueIdxSql -> Seq(Seq("email"))))
    assert(catalogOver(db).uniqueKey("s", "t") == Some(Seq("email")))

    val empty = new StubDb(Map.empty)
    assert(catalogOver(empty).uniqueKey("s", "t") == None)
    assert(empty.executed.map(_._1) == Seq(template.pkSql, template.uniqueIdxSql))
  }

  test("fetchQueryResults (O15): all rows, all columns, as values") {
    val db = new StubDb(Map(
      "SELECT x, y FROM t" -> Seq(Seq(1, "a"), Seq(2, "b"))))
    val got = catalogOver(db).fetchQueryResults("SELECT x, y FROM t")
    assert(got == Vector(Vector(1, "a"), Vector(2, "b")))
    assert(db.openConnections == 0)
  }

  test("StaticCatalog answers offline") {
    val c = StaticCatalog(ListMap("k" -> "bigint"), Some(Seq("k")))
    assert(c.columnTypes("any", "thing") == ListMap("k" -> "bigint"))
    assert(c.uniqueKey("any", "thing") == Some(Seq("k")))
  }
}
