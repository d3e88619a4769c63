package graft

import java.nio.file.Files
import java.sql.DriverManager
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.sink.{JdbcConnectionFactory, PostgresUpsertSink}
import graft.sources.SourceRegistry

/** End-to-end exercise of the JDBC source (and the sink's insert path)
  * against a REAL database — embedded Derby, whose jars ship in
  * /opt/spark/jars, so this costs zero new dependencies. Until this spec the
  * `jdbc` provider was covered by registry dispatch only; here it round-trips
  * actual rows through Spark's JDBC relation:
  *
  *  - schema lowercase-conform (Derby uppercases unquoted identifiers, the
  *    exact mixed-case hazard the reference normalizes at the source,
  *    `/root/reference/get_s3_data_as_df.py:41-43`);
  *  - partitioned-read options pass-through (`partitionColumn` /
  *    `lowerBound` / `upperBound` / `numPartitions` — the 100 TB posture: a
  *    big table pull must parallelize across executors);
  *  - the sink's insert-only fallback plus savepoint binary-split isolation
  *    against a real transactional backend (a PK violation must reject ONLY
  *    the bad row — previously proven only against the in-memory fake).
  */
class JdbcSourceDerbySpec extends AnyFunSuite with SparkSpec with BeforeAndAfterAll {

  private val dbDir = Files.createTempDirectory("graft-derby").resolve("db").toString
  private val url = s"jdbc:derby:$dbDir;create=true"

  override def beforeAll(): Unit = {
    super.beforeAll()
    // Embedded driver self-registers via ServiceLoader on first load; the
    // explicit forName keeps that independent of classloading order.
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.executeUpdate("CREATE TABLE Src_Events (Event_Id INT PRIMARY KEY, User_Name VARCHAR(32), Amount DOUBLE)")
    (1 to 20).foreach { i =>
      st.executeUpdate(s"INSERT INTO Src_Events VALUES ($i, 'user_$i', ${i * 1.5})")
    }
    // The sink emits EXACT double-quoted identifiers (r13: UpsertSqlGen
    // quoting), so its target table is created with the exact names the
    // upsert will address — the contract a mixed-case lake table needs.
    st.executeUpdate("""CREATE TABLE "Sink_Target" ("event_id" INT PRIMARY KEY, "user_name" VARCHAR(32))""")
    st.close(); c.close()
  }

  private def jdbcOpts(extra: (String, String)*): Map[String, String] =
    (Map("url" -> url, "driver" -> "org.apache.derby.jdbc.EmbeddedDriver") ++ extra).toMap

  test("reads through SourceRegistry(\"jdbc\") with lowercase-conformed schema") {
    val df = SourceRegistry("jdbc").load(spark, "Src_Events", jdbcOpts())
    assert(df.columns.toSeq == Seq("event_id", "user_name", "amount"))
    assert(df.count() == 20)
    val r = df.filter(df("event_id") === 7).head()
    assert(r.getString(1) == "user_7" && r.getDouble(2) == 10.5)
  }

  test("the reference's `pg` alias resolves to the jdbc provider") {
    assert(SourceRegistry("pg").load(spark, "Src_Events", jdbcOpts()).count() == 20)
  }

  test("partitioned-read options pass through to the JDBC relation") {
    val df = SourceRegistry("jdbc").load(spark, "Src_Events", jdbcOpts(
      "partitionColumn" -> "Event_Id", "lowerBound" -> "1",
      "upperBound" -> "21", "numPartitions" -> "4"))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 20) // stride predicates must not drop or duplicate rows
  }

  test("subquery-as-table: `(select …) alias` reads like the reference's dbtable form") {
    val df = SourceRegistry("jdbc").load(spark,
      "(SELECT Event_Id, Amount FROM Src_Events WHERE Event_Id <= 5) t", jdbcOpts())
    assert(df.columns.toSeq == Seq("event_id", "amount"))
    assert(df.count() == 5)
  }

  test("sink insert path + binary-split isolation against a real database") {
    import spark.implicits._
    // Row 13 collides with a pre-seeded PK — the savepoint binary split must
    // land the other 20 rows and reject exactly that one, on real JDBC
    // savepoints rather than the unit suite's stateful fake.
    val pre = DriverManager.getConnection(url)
    pre.createStatement().executeUpdate("""INSERT INTO "Sink_Target" VALUES (13, 'occupied')""")
    pre.close()
    val df = (1 to 21).toDF("event_id")
      .selectExpr("event_id", "concat('w_', event_id) AS user_name")
    // Mixed-case targets are addressed PRE-QUOTED (unquoted parts fold to
    // lower case since r14 — see UpsertSqlGen.quoteTable).
    val stats = PostgresUpsertSink.upsert(
      df, "\"Sink_Target\"", uniqueKey = None,
      factory = JdbcConnectionFactory(url, user = "", password = "", properties = Map.empty),
      batchSize = 8, parallelism = 2)
    assert(stats.loaded == 20)
    assert(stats.rejected == 1)
    assert(stats.errors.exists(_.toLowerCase.contains("duplicate key")
      || stats.errors.exists(_.contains("23505"))))
    // Exact-case table through Spark's JDBC relation needs the quoted form
    // in dbtable (unquoted, Derby would fold it to SINK_TARGET).
    val back = SourceRegistry("jdbc").load(spark, "\"Sink_Target\"", jdbcOpts())
    assert(back.count() == 21) // 20 landed + the pre-seeded occupant
    assert(back.filter("event_id = 13").head().getString(1) == "occupied")
  }
}
