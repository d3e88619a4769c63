package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MergeOps

class MergeOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("merge = upsert semantics: update hits, keep misses, insert news") {
    val target = Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("k", "v")
    val source = Seq((2L, "new2", 1), (4L, "new4", 1)).toDF("k", "v", "ord")
    val out = MergeOps.merge(target, source, Seq("k"), Seq($"ord"))
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "old1"), (2L, "new2"), (3L, "old3"), (4L, "new4")))
  }

  test("last write wins within source by ord") {
    val target = Seq((1L, "old")).toDF("k", "v")
    val source = Seq((1L, "v1", 1), (1L, "v2", 2), (1L, "v3", 3)).toDF("k", "v", "ord")
    val out = MergeOps.merge(target, source, Seq("k"), Seq($"ord")).collect()
    assert(out.length == 1 && out.head.getString(1) == "v3")
  }

  test("composite keys") {
    val target = Seq((1L, 1, "a"), (1L, 2, "b")).toDF("k1", "k2", "v")
    val source = Seq((1L, 2, "B", 1)).toDF("k1", "k2", "v", "ord")
    val out = MergeOps.merge(target, source, Seq("k1", "k2"), Seq($"ord"))
      .orderBy($"k1", $"k2").collect().map(_.getString(2))
    assert(out.toSeq == Seq("a", "B"))
  }

  test("applyChanges: upsert, insert, delete, last-op-wins, absent-key delete no-op") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "A", "u", 1), // update
      (4L, "D", "u", 1), // insert
      (2L, "b", "d", 1), // delete
      (3L, "X", "u", 1), (3L, "x2", "d", 2), // upsert then delete → gone
      (9L, "-", "d", 1) // delete of absent key → no-op
    ).toDF("k", "v", "op", "ord")
    val out = MergeOps.applyChanges(target, changes, Seq("k"), Seq($"ord"))
      .as[(Long, String)].collect().toSet
    assert(out == Set(1L -> "A", 4L -> "D"))
  }

  test("applyChanges: delete then re-upsert keeps the re-upsert") {
    val target = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "-", "d", 1), (1L, "A2", "u", 2)).toDF("k", "v", "op", "ord")
    val out = MergeOps.applyChanges(target, changes, Seq("k"), Seq($"ord"))
      .as[(Long, String)].collect().toSet
    assert(out == Set(1L -> "A2"))
  }

  test("applyChanges rejects unknown ops instead of coercing them") {
    val target = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "A", "upsert", 1)).toDF("k", "v", "op", "ord")
    val ex = intercept[Exception](
      MergeOps.applyChanges(target, changes, Seq("k"), Seq($"ord")).collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("unknown op")))
  }

  test("snapshotDiff: added/removed/changed/unchanged, null-safe columns") {
    val v1 = Seq((1L, Some("a"), 10L), (2L, Some("b"), 20L), (3L, None, 30L),
      (4L, Some("d"), 40L)).toDF("k", "t", "n")
    val v2 = Seq((2L, Some("B"), 20L), (3L, None, 30L), (4L, Some("d"), 41L),
      (5L, Some("e"), 50L)).toDF("k", "t", "n")
    val got = MergeOps.snapshotDiff(v1, v2, Seq("k"))
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(
      (1L, "removed"),
      (2L, "changed"),       // t differs
      (3L, "unchanged"),     // null t compares null-safely equal
      (4L, "changed"),       // n differs
      (5L, "added")))
  }

  test("snapshotDiff: an all-null non-key row is present, not phantom-removed") {
    val v1 = Seq((1L, Option.empty[String])).toDF("k", "t")
    val v2 = Seq((1L, Option.empty[String])).toDF("k", "t")
    val got = MergeOps.snapshotDiff(v1, v2, Seq("k")).collect()
    assert(got.length == 1 && got(0).getString(1) == "unchanged")
  }

  test("snapshotDiff rejects mismatched schemas and empty keys") {
    val a = Seq((1L, "x")).toDF("k", "t")
    assertThrows[IllegalArgumentException](
      MergeOps.snapshotDiff(a, a.withColumnRenamed("t", "u"), Seq("k")))
    assertThrows[IllegalArgumentException](MergeOps.snapshotDiff(a, a, Seq.empty))
  }
}
