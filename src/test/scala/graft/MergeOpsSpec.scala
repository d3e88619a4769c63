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

  test("snapshotDiff digest discriminates null POSITIONS, not just null " +
    "presence (the r21 hash-compare must match the old per-column <=>)") {
    // xxhash64 skips null inputs, so a naive digest of the bare columns
    // would hash ("x", null) and (null, "x") identically; the interleaved
    // isnull flags must keep them apart — these rows are "changed".
    val v1 = Seq((1L, Some("x"), Option.empty[String]),
      (2L, Some("y"), Some("")), (3L, Option.empty[String], Some("z")))
      .toDF("k", "t", "u")
    val v2 = Seq((1L, Option.empty[String], Some("x")),
      (2L, Some("y"), Option.empty[String]), (3L, Option.empty[String], Some("z")))
      .toDF("k", "t", "u")
    val got = MergeOps.snapshotDiff(v1, v2, Seq("k"))
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(
      (1L, "changed"),    // null moved columns
      (2L, "changed"),    // empty string vs NULL
      (3L, "unchanged"))) // identical including the null
  }

  test("snapshotDiff rejects mismatched schemas and empty keys") {
    val a = Seq((1L, "x")).toDF("k", "t")
    assertThrows[IllegalArgumentException](
      MergeOps.snapshotDiff(a, a.withColumnRenamed("t", "u"), Seq("k")))
    assertThrows[IllegalArgumentException](MergeOps.snapshotDiff(a, a, Seq.empty))
  }

  // The IVM contract: refreshing a stored aggregate with a CDC batch equals
  // recomputing the aggregate over the applied snapshot — on randomized
  // bases and batches covering in-place updates, group moves, inserts,
  // deletes, emptied groups, and multi-op keys.
  test("refreshAggregate == recompute over applyChanges (randomized)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val nKeys = 30 + rnd.nextInt(40)
      val base = (1 to nKeys).map { k =>
        (k.toLong, rnd.nextInt(6), BigDecimal(rnd.nextInt(20000), 2))
      }.toDF("k", "g", "v")
      val ops = (1 to 40).map { i =>
        val k = 1L + rnd.nextInt(nKeys + 10) // some keys absent from base
        val op = if (rnd.nextBoolean()) "u" else "d"
        (k, rnd.nextInt(8), BigDecimal(rnd.nextInt(20000), 2), op, i)
      }.toDF("k", "g", "v", "op", "ord")
      def aggOf(df: org.apache.spark.sql.DataFrame) =
        df.groupBy($"g").agg(count(lit(1)).as("cnt"), sum($"v").as("sv"))
      val refreshed = MergeOps.refreshAggregate(
          aggOf(base), base, ops, Seq("k"), Seq("g"),
          Seq("sv" -> $"v"), Seq($"ord"))
        .select($"g", $"cnt", $"sv".cast("decimal(20,2)"))
        .orderBy($"g").collect().toSeq
      val recomputed = aggOf(MergeOps.applyChanges(base, ops, Seq("k"), Seq($"ord")))
        .select($"g", $"cnt", $"sv".cast("decimal(20,2)"))
        .orderBy($"g").collect().toSeq
      assert(refreshed == recomputed, s"trial $trial")
    }
  }

  test("refreshAggregate drops emptied groups and creates delta-born ones") {
    val base = Seq((1L, 10, BigDecimal(5)), (2L, 10, BigDecimal(7))).toDF("k", "g", "v")
    val baseAgg = base.groupBy($"g").agg(count(lit(1)).as("cnt"), sum($"v").as("sv"))
    val changes = Seq(
      (1L, 10, BigDecimal(0), "d", 1), // delete half of group 10
      (2L, 99, BigDecimal(7), "u", 1), // move the other half to new group 99
      (3L, 50, BigDecimal(3), "u", 1)  // insert into brand-new group 50
    ).toDF("k", "g", "v", "op", "ord")
    val out = MergeOps.refreshAggregate(baseAgg, base, changes,
        Seq("k"), Seq("g"), Seq("sv" -> $"v"), Seq($"ord"))
      .select($"g", $"cnt", $"sv".cast("long"))
      .as[(Int, Long, Long)].collect().toSet
    assert(out == Set((99, 1L, 7L), (50, 1L, 3L))) // group 10 emptied → gone
  }

  test("refreshAggregate rejects unknown ops and missing aggregate columns") {
    val base = Seq((1L, 1, BigDecimal(1))).toDF("k", "g", "v")
    val baseAgg = base.groupBy($"g").agg(count(lit(1)).as("cnt"), sum($"v").as("sv"))
    val bad = Seq((1L, 1, BigDecimal(1), "x", 1)).toDF("k", "g", "v", "op", "ord")
    assertThrows[Exception](MergeOps.refreshAggregate(baseAgg, base, bad,
      Seq("k"), Seq("g"), Seq("sv" -> $"v"), Seq($"ord")).collect())
    assertThrows[IllegalArgumentException](MergeOps.refreshAggregate(
      baseAgg.drop("sv"), base, bad, Seq("k"), Seq("g"),
      Seq("sv" -> $"v"), Seq($"ord")))
  }
}
