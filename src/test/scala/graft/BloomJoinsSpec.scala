package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BloomJoins

class BloomJoinsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin equals the plain left-semi join on the fixture") {
    val l = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val urgent = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey".as("l_orderkey"))
    val got = BloomJoins.bloomSemiJoin(l, urgent, Seq("l_orderkey"))
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().toSet
    val plain = l.join(urgent, Seq("l_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().toSet
    assert(got === plain)
    assert(plain.nonEmpty)
  }

  test("multi-column keys and duplicate small-side rows") {
    val large = Seq((1L, "a", 10), (1L, "b", 20), (2L, "a", 30), (3L, "c", 40))
      .toDF("k1", "k2", "v")
    val small = Seq((1L, "a"), (1L, "a"), (3L, "c"), (9L, "z"))
      .toDF("k1", "k2")
    val got = BloomJoins.bloomSemiJoin(large, small, Seq("k1", "k2"))
      .select("v").as[Int].collect().toSet
    assert(got === Set(10, 40)) // semi-join: once each, (1,b)/(2,a) excluded
  }

  test("empty small side yields an empty result, not a full scan match") {
    val large = Seq((1L, "x")).toDF("k", "v")
    val small = Seq.empty[Long].toDF("k")
    assert(BloomJoins.bloomSemiJoin(large, small, Seq("k")).count() === 0L)
  }

  test("plan: membership test prunes the large side before its exchange") {
    val l = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val urgent = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey".as("l_orderkey"))
    val df = BloomJoins.bloomSemiJoin(l, urgent, Seq("l_orderkey"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"bloom membership test missing from plan:\n$p")
    // The filter must sit in the large side's scan stage — i.e. BELOW any
    // exchange: in the plan string the first might_contain appears after the
    // last Exchange mention only if it ran post-shuffle. Cheap structural
    // check: the Filter containing might_contain references the parquet scan
    // in the same whole-stage block (no Exchange between them).
    val idx = p.indexOf("might_contain")
    val tail = p.substring(idx)
    val scanIdx = tail.indexOf("FileScan parquet")
    val exIdx = tail.indexOf("Exchange")
    assert(scanIdx >= 0 && (exIdx < 0 || scanIdx < exIdx),
      s"might_contain must be in the scan stage, before any exchange:\n$p")
  }
}
