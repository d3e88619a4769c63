package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TemporalJoins

class TemporalJoinsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // (key, time, left payload)
  private val L = Seq(
    (1L, 10L, "l-a"), (1L, 20L, "l-b"), (1L, 5L, "l-early"),
    (2L, 100L, "l-c"), (3L, 7L, "l-lonely")).toDF("k", "lt", "lv")
  // (key, time, right payload) — key 3 has no right rows at all
  private val R = Seq(
    (1L, 10L, "r-tie"), (1L, 15L, "r-mid"), (1L, 2L, "r-first"),
    (2L, 90L, "r-x"), (2L, 101L, "r-late")).toDF("k", "rt", "rv")

  private def asofRows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "lt", "lv", "rt", "rv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), Option(r.getString(4)))).toSet

  test("backward as-of: greatest rt <= lt per key, inclusive; unmatched stay null") {
    val got = asofRows(TemporalJoins.asofJoin(L, R, Seq("k"), "lt", "rt"))
    assert(got === Set(
      (1L, 10L, "l-a", Some(10L), Some("r-tie")),   // tie is inclusive
      (1L, 20L, "l-b", Some(15L), Some("r-mid")),
      (1L, 5L, "l-early", Some(2L), Some("r-first")),
      (2L, 100L, "l-c", Some(90L), Some("r-x")),    // 101 is in the future
      (3L, 7L, "l-lonely", None, None)))            // left-outer semantics
  }

  test("forward as-of: smallest rt >= lt per key, inclusive") {
    val got = asofRows(TemporalJoins.asofJoin(L, R, Seq("k"), "lt", "rt",
      direction = "forward"))
    assert(got === Set(
      (1L, 10L, "l-a", Some(10L), Some("r-tie")),
      (1L, 20L, "l-b", None, None),                 // nothing at/after 20
      (1L, 5L, "l-early", Some(10L), Some("r-tie")),
      (2L, 100L, "l-c", Some(101L), Some("r-late")),
      (3L, 7L, "l-lonely", None, None)))
  }

  test("tolerance nulls out matches farther than the bound, keeps the row") {
    val got = asofRows(TemporalJoins.asofJoin(L, R, Seq("k"), "lt", "rt",
      tolerance = Some(3L)))
    assert(got === Set(
      (1L, 10L, "l-a", Some(10L), Some("r-tie")),   // distance 0: in
      (1L, 20L, "l-b", None, None),                 // distance 5 > 3: out
      (1L, 5L, "l-early", Some(2L), Some("r-first")), // distance 3 = bound: in
      (2L, 100L, "l-c", None, None),                // distance 10 > 3: out
      (3L, 7L, "l-lonely", None, None)))
  }

  test("as-of equals the brute-force formulation on random data") {
    val rng = new scala.util.Random(7)
    val lrows = (1 to 300).map(i => (rng.nextInt(20).toLong, rng.nextInt(1000).toLong, i.toLong))
    val rrows = (1 to 300).map(i => (rng.nextInt(20).toLong, rng.nextInt(1000).toLong, i.toLong))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq // unique (k, t)
    val l = lrows.toDF("k", "lt", "lid")
    val r = rrows.toDF("k", "rt", "rid")
    val got = TemporalJoins.asofJoin(l, r, Seq("k"), "lt", "rt")
      .select("k", "lt", "lid", "rt", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3))).toSet
    val expected = lrows.map { case (k, lt, lid) =>
      val best = rrows.filter(r => r._1 == k && r._2 <= lt).sortBy(_._2).lastOption
      (k, lt, lid, best.map(_._2).getOrElse(-1L))
    }.toSet
    assert(got === expected)
  }

  test("as-of plan is join-free: one window, no Join operator") {
    val df = TemporalJoins.asofJoin(L, R, Seq("k"), "lt", "rt")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert(p.contains("Window"), s"as-of must be a window pass:\n$p")
  }

  private val pts = Seq(
    (1L, 10L, "p-a"), (1L, 55L, "p-b"), (1L, 1000L, "p-out"),
    (2L, 10L, "p-other")).toDF("k", "x", "pv")
  private val ivs = Seq(
    (1L, 0L, 20L, "i-low"), (1L, 10L, 60L, "i-wide"), (1L, 200L, 100L, "i-inverted"),
    (2L, 900L, 1100L, "i-k2")).toDF("k", "s", "e", "iv")

  test("range join: inclusive containment, multi-bucket intervals, no duplicate pairs") {
    // bucketWidth 16 makes i-wide span 4 buckets; the point inside it must
    // still match exactly once.
    val got = TemporalJoins.rangeJoin(pts, ivs, Seq("k"), "x", "s", "e", bucketWidth = 16)
      .select("k", "x", "pv", "iv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toList
    assert(got.size == got.distinct.size, "a (point, interval) pair must appear exactly once")
    assert(got.toSet === Set(
      (1L, 10L, "p-a", "i-low"), (1L, 10L, "p-a", "i-wide"),
      (1L, 55L, "p-b", "i-wide")))
    // inverted interval matches nothing; k2 point at 10 misses [900, 1100]
  }

  test("range join equals the brute-force BETWEEN join for any bucket width") {
    val rng = new scala.util.Random(11)
    val p = (1 to 200).map(i => (rng.nextInt(5).toLong, rng.nextInt(500).toLong - 250L, i.toLong))
      .toDF("k", "x", "pid")
    val ivr = (1 to 100).map { i =>
      val s = rng.nextInt(500).toLong - 250L
      (rng.nextInt(5).toLong, s, s + rng.nextInt(60).toLong, i.toLong)
    }.toDF("k", "s", "e", "iid")
    val brute = p.join(ivr, Seq("k")).filter($"x" >= $"s" && $"x" <= $"e")
      .select("k", "x", "pid", "iid").as[(Long, Long, Long, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = TemporalJoins.rangeJoin(p, ivr, Seq("k"), "x", "s", "e", w)
        .select("k", "x", "pid", "iid").as[(Long, Long, Long, Long)].collect().toSet
      assert(got === brute, s"bucketWidth=$w diverged")
    }
  }

  test("range join plans as an equi-join on (keys, bucket) — no cartesian/BNLJ") {
    val df = TemporalJoins.rangeJoin(pts, ivs, Seq("k"), "x", "s", "e", bucketWidth = 16)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"range join must stay an equi-join:\n$p")
  }

  test("floorDiv is exact across the long range, negatives included") {
    val cases = Seq(-7L, -1L, 0L, 1L, 7L, Long.MaxValue - 1, Long.MinValue + 1,
      (1L << 60) + 12345L)
    val got = cases.toDF("x")
      .select(TemporalJoins.floorDiv($"x", 7L)).as[Long].collect()
    assert(got.toSeq === cases.map(x => Math.floorDiv(x, 7L)))
  }

  test("interval join: touching endpoints match, multi-bucket pairs appear once") {
    val l = Seq((1L, 0L, 40L, 100L), (1L, 50L, 60L, 101L), (2L, 0L, 5L, 102L))
      .toDF("k", "ls", "le", "lid")
    val r = Seq(
      (1L, 40L, 45L, 200L), // touches lid=100 at a single point (40)
      (1L, 10L, 55L, 201L), // spans buckets; overlaps BOTH left rows
      (1L, 61L, 70L, 202L), // just past lid=101 — no match
      (2L, 900L, 999L, 203L)).toDF("k", "rs", "re", "rid")
    val got = TemporalJoins.intervalJoin(l, r, Seq("k"), "ls", "le", "rs", "re",
        bucketWidth = 16)
      .select("lid", "rid").as[(Long, Long)].collect().toList
    assert(got.size == got.distinct.size, "each overlapping pair exactly once")
    assert(got.toSet === Set((100L, 200L), (100L, 201L), (101L, 201L)))
  }

  test("interval join equals the brute-force overlap join for any bucket width") {
    val rng = new scala.util.Random(23)
    def ivs(n: Int, tag: String) = (1 to n).map { i =>
      val s = rng.nextInt(500).toLong - 250L
      (rng.nextInt(5).toLong, s, s + rng.nextInt(80).toLong, i.toLong)
    }
    val l = ivs(120, "l").toDF("k", "ls", "le", "lid")
    val r = ivs(120, "r").toDF("k", "rs", "re", "rid")
    val brute = l.join(r, Seq("k")).filter($"ls" <= $"re" && $"rs" <= $"le")
      .select("k", "lid", "rid").as[(Long, Long, Long)].collect()
    assert(brute.length == brute.distinct.length)
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = TemporalJoins.intervalJoin(l, r, Seq("k"), "ls", "le", "rs", "re", w)
        .select("k", "lid", "rid").as[(Long, Long, Long)].collect()
      assert(got.length == got.distinct.length, s"bucketWidth=$w duplicated a pair")
      assert(got.toSet === brute.toSet, s"bucketWidth=$w diverged")
    }
  }

  test("interval join plans as an equi-join on (keys, bucket) — no cartesian/BNLJ") {
    val l = Seq((1L, 0L, 40L, 100L)).toDF("k", "ls", "le", "lid")
    val r = Seq((1L, 40L, 45L, 200L)).toDF("k", "rs", "re", "rid")
    val p = TemporalJoins.intervalJoin(l, r, Seq("k"), "ls", "le", "rs", "re", 16)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"interval join must stay an equi-join:\n$p")
  }
}
