package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skyline

/** The grid-pruned two-phase skyline must reproduce the brute-force
  * dominance definition exactly — including the pruning edge cases: points
  * sharing an x (same-bucket lexicographic test), dominators landing in
  * earlier buckets (prefix-min test), single-bucket degeneration, and
  * bucket counts exceeding the point count.
  */
class SkylineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long)]): Set[(Long, Long)] =
    pts.filterNot { case (x, y) =>
      pts.exists { case (bx, by) =>
        bx <= x && by <= y && (bx < x || by < y)
      }
    }.toSet

  private def grid(pts: Seq[(Long, Long)], buckets: Int): Set[(Long, Long)] =
    Skyline.skyline2dMin(pts.toDF("x", "y"), "x", "y", buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("random distinct points ≡ brute force across bucket counts") {
    val rng = new scala.util.Random(41)
    val pts = Seq.fill(600)((rng.nextInt(500).toLong, rng.nextInt(500).toLong))
      .distinct
    val expected = brute(pts)
    for (b <- Seq(1, 3, 64, 10000)) {
      assert(grid(pts, b) == expected, s"buckets=$b")
    }
  }

  test("ties on one axis: staircase with duplicate x and duplicate y") {
    // Vertical runs (same x, several y) exercise the within-bucket
    // lexicographic frame; horizontal runs (same y, several x) exercise
    // the cross-bucket prefix min at exact equality (≤, not <).
    val pts = Seq[(Long, Long)](
      (10, 50), (10, 40), (10, 60), // same x — only (10,40) can survive
      (20, 40), (30, 40),           // same y as the x=10 min — dominated
      (20, 30), (40, 10), (40, 20), (50, 5))
    val expected = brute(pts)
    assert(expected == Set[(Long, Long)]((10, 40), (20, 30), (40, 10), (50, 5)))
    for (b <- Seq(1, 2, 7)) assert(grid(pts, b) == expected, s"buckets=$b")
  }

  test("degenerate inputs: empty, single point, all-equal x") {
    assert(grid(Seq.empty, 8) == Set.empty)
    assert(grid(Seq((7L, 7L)), 8) == Set((7L, 7L)))
    val sameX = Seq[(Long, Long)]((5, 9), (5, 3), (5, 12))
    assert(grid(sameX, 8) == Set[(Long, Long)]((5, 3)))
  }

  test("anti-chain survives whole: strictly decreasing staircase") {
    val pts = (0L until 50L).map(i => (i, 100L - i))
    assert(grid(pts, 6) == pts.toSet)
  }

  private def brute3(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filterNot { p =>
      pts.exists { q =>
        q._1 <= p._1 && q._2 <= p._2 && q._3 <= p._3 &&
          (q._1 < p._1 || q._2 < p._2 || q._3 < p._3)
      }
    }.toSet

  private def grid3(pts: Seq[(Long, Long, Long)], buckets: Int): Set[(Long, Long, Long)] =
    Skyline.skylineGridMin(pts.toDF("x", "y", "z"), Seq("x", "y", "z"), buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("3D grid skyline ≡ brute force: random, correlated, anticorrelated") {
    val rng = new scala.util.Random(67)
    val random = Seq.fill(400)(
      (rng.nextInt(300).toLong, rng.nextInt(300).toLong, rng.nextInt(300).toLong))
      .distinct
    // anticorrelated plane x+y+z ≈ 300: almost everything is a skyline
    // point — the honest worst case (cell prune kills nothing)
    val anti = Seq.fill(200) {
      val x = rng.nextInt(150).toLong; val y = rng.nextInt((301 - x).toInt).toLong
      (x, y, 300L - x - y)
    }.distinct
    // correlated diagonal band: the cell prune kills nearly everything
    val corr = (0L until 150L).map(i => (i, i + rng.nextInt(5), i + rng.nextInt(5)))
      .map(t => (t._1, t._2.toLong, t._3.toLong)).distinct
    for ((pts, tag) <- Seq((random, "random"), (anti, "anti"), (corr, "corr"));
         b <- Seq(1, 2, 5, 16)) {
      assert(grid3(pts, b) == brute3(pts), s"$tag buckets=$b")
    }
    assert(grid3(Seq.empty, 8) == Set.empty)
    assert(grid3(Seq((7L, 7L, 7L)), 8) == Set((7L, 7L, 7L)))
  }

  test("grid cap: bucketsPerDim^d over 8192 is rejected, a within-cap grid works") {
    val pts = Seq((1L, 2L, 3L, 4L), (4L, 3L, 2L, 1L)).toDF("a", "b", "c", "d")
    // d=4 at the d=3 default of 16/dim is exactly the silent-driver-blowup
    // case the cap exists for (65k cells, ~4e9 corner comparisons)
    intercept[IllegalArgumentException] {
      Skyline.skylineGridMin(pts, Seq("a", "b", "c", "d"), 16)
    }
    // a within-cap d=4 grid (9^4 = 6561 cells) must work
    val sky = Skyline.skylineGridMin(pts, Seq("a", "b", "c", "d"), 9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(sky == Set((1L, 2L, 3L, 4L), (4L, 3L, 2L, 1L)))
  }

  test("per-group skyline ≡ per-group brute force on random grouped points") {
    val rng = new scala.util.Random(59)
    val pts = Seq.fill(900)(
      (rng.nextInt(6).toLong, rng.nextInt(200).toLong, rng.nextInt(200).toLong))
      .distinct
    val expected = pts.groupBy(_._1).flatMap { case (g, ps) =>
      brute(ps.map(p => (p._2, p._3))).map { case (x, y) => (g, x, y) }
    }.toSet
    val got = Skyline.skyline2dMinPerGroup(
        pts.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("per-group 3D skyline ≡ per-group brute force: random, anticorrelated, many partitions") {
    val rng = new scala.util.Random(73)
    val rand = Seq.fill(800)((s"g${rng.nextInt(5)}",
      rng.nextInt(60).toLong, rng.nextInt(60).toLong, rng.nextInt(60).toLong))
    // anticorrelated plane x+y+z = const: EVERY distinct point is a
    // skyline member — the worst case the merge join must pay honestly
    val anti = (0 until 100).map { i =>
      val x = rng.nextInt(50).toLong; val y = rng.nextInt(50).toLong
      ("anti", x, y, 120L - x - y)
    }
    val pts = (rand ++ anti).distinct
    val expected = pts.groupBy(_._1).flatMap { case (g, ps) =>
      brute3(ps.map(p => (p._2, p._3, p._4))).map { case (x, y, z) => (g, x, y, z) }
    }.toSet
    // many small partitions: the local frontier folds must stay a
    // COMPLETE candidate filter whatever the data placement
    val df = pts.toDF("g", "x", "y", "z").repartition(13)
    val got = Skyline.skylineMinPerGroup(df, Seq("g"), Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("per-group 3D skyline: NULL group key is its own group; extra columns pass through") {
    val pts = Seq((Some("a"), 1L, 5L, 5L, "p1"), (Some("a"), 5L, 1L, 5L, "p2"),
      (Some("a"), 2L, 4L, 7L, "p3"), (None, 3L, 3L, 3L, "n1"),
      (None, 4L, 4L, 4L, "n2-dominated"))
      .toDF("g", "x", "y", "z", "tag")
    val got = Skyline.skylineMinPerGroup(pts, Seq("g"), Seq("x", "y", "z"))
      .select($"g", $"tag").as[(Option[String], String)].collect().toSet
    assert(got == Set((Some("a"), "p1"), (Some("a"), "p2"),
      (Some("a"), "p3"), (None, "n1")), s"got $got")
  }

  test("skylineMinPerGroup validates dim and group column types at plan time") {
    import org.apache.spark.sql.functions._
    val pts = Seq(("a", 1L, 2L)).toDF("g", "x", "y")
    // non-integral dim: fails on the DRIVER, before any job runs
    val dbl = pts.withColumn("x", $"x".cast("double"))
    val e1 = intercept[IllegalArgumentException](
      Skyline.skylineMinPerGroup(dbl, Seq("g"), Seq("x", "y")))
    assert(e1.getMessage.contains("quantize"), e1.getMessage)
    // nested group key: the frontier map cannot safely copy it out of the
    // reused row buffer — rejected up front
    val arr = pts.withColumn("g", array($"g"))
    val e2 = intercept[IllegalArgumentException](
      Skyline.skylineMinPerGroup(arr, Seq("g"), Seq("x", "y")))
    assert(e2.getMessage.contains("atomic"), e2.getMessage)
    val bin = pts.withColumn("g", $"g".cast("binary"))
    intercept[IllegalArgumentException](
      Skyline.skylineMinPerGroup(bin, Seq("g"), Seq("x", "y")))
  }
}
