package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift tripwire. The shared `/root/testdata` fixtures are
  * regenerated outside this repo's control and their PHYSICAL types have
  * drifted before (round 10: `events.ts` flipped from parquet
  * TIMESTAMP(NANOS) to timestamp[us] and silently killed all 18 event-time
  * gates — they errored at analysis before producing output, so the
  * correctness report simply omitted them). This spec turns any future
  * drift into ONE loud, named failure:
  *   - every table the gates read must expose the expected columns;
  *   - `events.ts` must be a physical type [[Tables.events]] can normalize,
  *     and the normalized frame must be nanos-as-BIGINT in a sane range.
  * If a regeneration changes a schema, this fails first — fix
  * [[Tables.events]] (or the gates) and re-dump FIXTURES.md.
  */
class FixtureSchemaSpec extends AnyFunSuite with SparkSpec {

  private val expectedCols = Map(
    "region" -> Set("r_regionkey", "r_name"),
    "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier" -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"),
    "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"),
    "events" -> Set("event_id", "ts", "user_id", "event_type", "value"),
    "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Set("vec_id", "embedding", "label"))

  test("every fixture table exposes the columns the gates read") {
    for ((table, want) <- expectedCols) {
      val got = Tables.t(spark, sf0001, table).schema.fieldNames.toSet
      val missing = want -- got
      assert(missing.isEmpty,
        s"fixture table '$table' lost columns $missing (has $got) — " +
          "the fixtures were regenerated with a different schema")
    }
  }

  test("date-filtered columns keep a temporal type the literal compares handle") {
    // q1's shipdate pushdown, q_skyline3d's ship-month slice, and the
    // orderdate windows all compare these columns against cast string
    // literals — a regeneration flipping them to e.g. epoch integers
    // would break the comparisons at analysis, the events.ts failure
    // mode. Pin the type family here so drift fails ONE named test.
    val temporal = Set[DataType](DateType, TimestampType, TimestampNTZType)
    for ((table, column) <- Seq("lineitem" -> "l_shipdate", "orders" -> "o_orderdate")) {
      val dt = Tables.t(spark, sf0001, table).schema(column).dataType
      assert(temporal(dt),
        s"$table.$column regenerated as non-temporal type $dt — " +
          "every literal date compare against it is now broken")
    }
  }

  test("events.ts physical type is one Tables.events can normalize") {
    val raw = Tables.t(spark, sf0001, "events").schema("ts").dataType
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType)(raw),
      s"events.ts regenerated as unhandled type $raw — extend Tables.events")
  }

  test("normalized events.ts is nanos-as-BIGINT in a sane epoch range") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType == LongType)
    val r = ev.agg(min(col("ts")), max(col("ts"))).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    // nanoseconds since epoch between 2000-01-01 and 2100-01-01: a wrong
    // unit (seconds, micros) or a wrong zero point lands far outside
    assert(lo > 946684800L * 1000000000L && hi < 4102444800L * 1000000000L,
      s"normalized ts range [$lo, $hi] is not plausible nanos-since-epoch")
  }
}
