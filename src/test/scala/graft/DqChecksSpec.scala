package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DqChecks
import graft.operators.DqChecks.{FkCheck, UniqueCheck}

/** [[graft.operators.DqChecks]] — declarative constraint checking. */
class DqChecksSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // (id, fk, v): planted problems — null fk (row 4), duplicate id 2,
  // out-of-range v (row 5), orphan fk 99 (row 6), null v (row 7).
  private def fixture = Seq(
    (1L, Option(10L), Option(5.0)),
    (2L, Option(10L), Option(6.0)),
    (2L, Option(11L), Option(7.0)),
    (4L, None, Option(8.0)),
    (5L, Option(11L), Option(50.0)),
    (6L, Option(99L), Option(9.0)),
    (7L, Option(10L), None)
  ).toDF("id", "fk", "v").repartition(3)

  private def refDim = Seq(10L, 11L, 12L).toDF("ref_id")

  test("all constraint kinds count their planted violations exactly") {
    val got = DqChecks.check(fixture,
        rowChecks = Seq(
          DqChecks.notNull("nn_fk", $"fk"),
          DqChecks.satisfies("range_v", $"v".between(0.0, 10.0)),
          DqChecks.satisfies("pos_id", $"id" > 0)),
        uniques = Seq(UniqueCheck("uniq_id", Seq("id"))),
        fks = Seq(FkCheck("fk_dim", Seq("fk"), refDim, Seq("ref_id"))))
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "nn_fk" -> 1L,     // row 4
      "range_v" -> 2L,   // 50.0 out of range + NULL v counts as violation
      "pos_id" -> 0L,    // zero-violation checks still report
      "uniq_id" -> 1L,   // one surplus row for id 2
      "fk_dim" -> 1L))   // fk 99; the NULL fk is NOT an orphan
  }

  test("empty input reports zeros, not an empty frame") {
    val got = DqChecks.check(fixture.filter($"id" < 0),
        rowChecks = Seq(DqChecks.notNull("nn_fk", $"fk")),
        uniques = Seq(UniqueCheck("uniq_id", Seq("id"))),
        fks = Seq(FkCheck("fk_dim", Seq("fk"), refDim, Seq("ref_id"))))
      .as[(String, Long)].collect().toMap
    assert(got === Map("nn_fk" -> 0L, "uniq_id" -> 0L, "fk_dim" -> 0L))
  }

  test("composite unique + composite fk") {
    val df = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 9L))
      .toDF("a", "b").repartition(2)
    val ref = Seq((1L, 1L), (1L, 2L)).toDF("ra", "rb")
    val got = DqChecks.check(df,
        uniques = Seq(UniqueCheck("uab", Seq("a", "b"))),
        fks = Seq(FkCheck("fab", Seq("a", "b"), ref, Seq("ra", "rb"))))
      .as[(String, Long)].collect().toMap
    assert(got === Map("uab" -> 1L, "fab" -> 1L))
  }

  test("duplicate check names and empty constraint sets are rejected") {
    assertThrows[IllegalArgumentException](DqChecks.check(fixture))
    assertThrows[IllegalArgumentException](DqChecks.check(fixture,
      rowChecks = Seq(DqChecks.notNull("x", $"fk"),
        DqChecks.satisfies("x", $"v" > 0))))
  }

  test("row-level checks fuse into one aggregate pass (one scan)") {
    val report = DqChecks.check(fixture, rowChecks = Seq(
      DqChecks.notNull("a", $"fk"),
      DqChecks.satisfies("b", $"v" > 0),
      DqChecks.satisfies("c", $"id" < 100)))
    report.collect()
    // isFinalPlan toString prints Final AND Initial sections — count the
    // final one only.
    val p = report.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "Scan ExistingRDD|LocalTableScan".r.findAllIn(p).size
    assert(scans === 1, s"3 row checks must share one scan:\n$p")
  }
}
