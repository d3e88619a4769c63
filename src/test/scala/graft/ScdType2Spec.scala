package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MergeOps

class ScdType2Spec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // (key, version, attr, op)
  private def build(rows: Seq[(String, Int, String, String)], collapse: Boolean) =
    MergeOps.scdType2(rows.toDF("k", "ver", "a", "op"), Seq("k"), "ver",
      collapseUnchanged = collapse)
      .select($"k", $"a", $"valid_from", $"valid_to", $"is_current")
      .as[(String, String, Int, Option[Int], Boolean)].collect().toSet

  test("versions chain into intervals; the last one is current") {
    val got = build(Seq(("x", 1, "A", "u"), ("x", 5, "B", "u"), ("x", 9, "C", "u")),
      collapse = false)
    assert(got === Set(("x", "A", 1, Some(5), false), ("x", "B", 5, Some(9), false),
      ("x", "C", 9, None, true)))
  }

  test("delete closes the open interval; re-insert opens a new version") {
    val got = build(Seq(("x", 1, "A", "u"), ("x", 4, "A", "d"), ("x", 7, "A", "u")),
      collapse = false)
    assert(got === Set(("x", "A", 1, Some(4), false), ("x", "A", 7, None, true)))
  }

  test("collapseUnchanged drops no-op updates but not a reverted value or a re-insert") {
    // A A B A  -> A(1..5) B(5..7) A(7..)   (row at 3 collapses)
    val reverted = build(Seq(("x", 1, "A", "u"), ("x", 3, "A", "u"),
      ("x", 5, "B", "u"), ("x", 7, "A", "u")), collapse = true)
    assert(reverted === Set(("x", "A", 1, Some(5), false), ("x", "B", 5, Some(7), false),
      ("x", "A", 7, None, true)))
    // A d A -> identical attrs across a delete still open a new version
    val acrossDelete = build(Seq(("y", 1, "A", "u"), ("y", 2, "A", "d"),
      ("y", 3, "A", "u")), collapse = true)
    assert(acrossDelete === Set(("y", "A", 1, Some(2), false), ("y", "A", 3, None, true)))
    // chained equals collapse transitively: A A A -> one row
    val chain = build(Seq(("z", 1, "A", "u"), ("z", 2, "A", "u"), ("z", 3, "A", "u")),
      collapse = true)
    assert(chain === Set(("z", "A", 1, None, true)))
  }

  test("null attributes compare null-safely under collapse") {
    val got = build(Seq(("x", 1, null, "u"), ("x", 3, null, "u"), ("x", 5, "B", "u")),
      collapse = true)
    assert(got === Set(("x", null, 1, Some(5), false), ("x", "B", 5, None, true)))
  }

  test("unknown op fails the job") {
    val ex = intercept[Exception] {
      build(Seq(("x", 1, "A", "upsert")), collapse = false)
    }
    assert(ex.getMessage.contains("unknown op"))
  }

  test("carryCols ride through without joining the unchanged-comparison") {
    val df = Seq(("x", 1, 101L, "A", "u"), ("x", 3, 102L, "A", "u"))
      .toDF("k", "ver", "audit", "a", "op")
    val got = MergeOps.scdType2(df, Seq("k"), "ver", carryCols = Seq("audit"),
        collapseUnchanged = true)
      .select($"audit", $"valid_from").as[(Long, Int)].collect().toSet
    assert(got === Set((101L, 1))) // row 102 collapsed despite a distinct audit id
  }

  test("plan: one exchange, one sort — the collapse filter preserves the lead pass's order") {
    val df = Seq(("x", 1, "A", "u")).toDF("k", "ver", "a", "op")
    val plan = MergeOps.scdType2(df, Seq("k"), "ver", collapseUnchanged = true)
      .queryExecution.executedPlan.toString
    def occurrences(s: String, sub: String): Int = s.sliding(sub.length).count(_ == sub)
    assert(occurrences(plan, "Exchange hashpartitioning") === 1, plan)
    assert(occurrences(plan, "Sort ") === 1, plan)
  }
}
