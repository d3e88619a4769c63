package graft

import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.StatOps

class StatOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("zscoreOutliers ≡ a driver-side exact-moment reference on the fixture") {
    val e = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"event_id", $"event_type", $"value")
    val rows = e.as[(Long, String, Double)].collect()
    val expect = rows.groupBy(_._2).toSeq.flatMap { case (tpe, grp) =>
      // Same quantization and arithmetic order as the operator.
      val vq = grp.map { case (id, _, v) =>
        id -> BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      }
      val n = vq.length
      val mean = (vq.map(_._2).sum.toDouble) / n
      val variance = (vq.map(t => t._2 * t._2).sum.toDouble) / n - mean * mean
      val sigma = math.sqrt(math.max(variance, 0.0))
      vq.map { case (id, q) =>
        (tpe, id, if (sigma == 0.0) 0.0 else (q.toDouble - mean) / sigma)
      }.sortBy { case (_, id, z) => (-math.abs(z), id) }.take(3)
    }.sortBy(t => (t._1, -math.abs(t._3), t._2))
    val got = StatOps.zscoreOutliers(e, "event_type", "value", "event_id", k = 3)
      .orderBy($"event_type", $"rnk")
      .select($"event_type", $"event_id", $"z")
      .as[(String, Long, Double)].collect().toSeq
    assert(got === expect)
  }

  test("zscoreOutliers: constant group reports z = 0, no division blow-up") {
    val d = Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.0),
      ("b", 4L, 1.0), ("b", 5L, 9.0)).toDF("g", "id", "v")
    val got = StatOps.zscoreOutliers(d, "g", "v", "id", k = 2)
      .orderBy($"g", $"rnk").as[(String, Int, Long, Double)].collect()
    assert(got.filter(_._1 == "a").forall(_._4 == 0.0))
    val b = got.filter(_._1 == "b")
    assert(b.map(_._3).toSeq == Seq(4L, 5L) && b.forall(r => math.abs(r._4) == 1.0))
  }

  test("robustOutliers: hand-computed medians, MAD, and the 4.5-MAD cut") {
    // g: values 1..9 plus a 1000.0 spike (n=10). Lower-middle disc median
    // of 10 values = 5; dev = {4,3,2,1,0,1,2,3,4,995}, sorted lower-middle
    // = 2 (MAD). Cut: dev·2 > 9·2=18 ⇔ dev > 9 → only the spike.
    // h: constant column — med = 7, mad = 0, a degenerate group where every
    // dev·2 > 0 row would flag; all devs are 0 so nothing flags.
    // Outputs are BIGINTs in integer ten-thousandths (the ⌊v·10⁴+0.5⌋
    // quantization), so the hand values scale by 10⁴.
    val d = ((1 to 9).map(i => ("g", i.toDouble)) :+ ("g", 1000.0)) ++
      Seq.fill(4)(("h", 7.0))
    val got = StatOps.robustOutliers(d.toDF("t", "v"), "t", "v")
      .orderBy($"grp")
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got === Seq(("g", 10L, 50000L, 20000L, 1L, 9950000L),
      ("h", 4L, 70000L, 0L, 0L, 0L)))
  }

  test("robustOutliers catches the two-spike masking case the z-screen misses") {
    // The classic masking failure: TWO extreme spikes inflate sigma so far
    // that each spike's own |z| stays under 3 — the moment screen reports
    // nothing. The median/MAD screen is untouched by the spikes and flags
    // exactly both. Base 1..11 + two 1e6 spikes: med = 7, MAD = 3,
    // cut dev > 13.5 → spikes only; each spike's z ≈ 2.34 < 3.
    val d = ((1 to 11).map(i => (i.toLong, i.toDouble)) ++
      Seq((100L, 1e6), (101L, 1e6))).toDF("id", "v")
      .withColumn("g", lit("m"))
    val robust = StatOps.robustOutliers(d, "g", "v")
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(robust._3 === 70000L && robust._4 === 30000L)
    assert(robust._5 === 2L)
    val zs = StatOps.zscoreOutliers(d, "g", "v", "id", k = 13)
      .select($"z").as[Double].collect()
    assert(zs.forall(z => math.abs(z) < 3.0),
      s"masking premise broken — a z cleared 3: ${zs.mkString(",")}")
  }

  test("columnProfile: counts, nulls, exact distinct, min/max; one aggregate job") {
    val d = Seq(
      (1L, Some("a"), 10), (2L, None, 10), (3L, Some("b"), 20),
      (4L, Some("a"), 30), (5L, None, 30)
    ).toDF("id", "s", "n")
    val got = StatOps.columnProfile(d, Seq("id", "s", "n"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 5L, 0L, 5L, "1", "5")))
    assert(got("s") == (("s", 5L, 2L, 2L, "a", "b")))
    assert(got("n") == (("n", 5L, 0L, 3L, "10", "30")))
    assert(got.size == 3)
    // single pass: the plan holds Expand for the k distinct counts and no Join
    val p = StatOps.columnProfile(d, Seq("id", "s", "n"))
      .queryExecution.executedPlan.toString
    assert(p.contains("Expand"), s"distincts should plan as one Expand pass:\n$p")
    assert(!p.contains("Join"), s"profile must stay a single aggregate, no joins:\n$p")
    assertThrows[IllegalArgumentException](StatOps.columnProfile(d, Seq.empty))
  }

  test("minMaxScale: bounds, constant groups, NULL pass-through, no value shuffle") {
    import spark.implicits._
    val d = Seq(("a", Some(10.0)), ("a", Some(20.0)), ("a", Some(15.0)),
      ("a", None), ("k", Some(5.0)), ("k", Some(5.0)))
      .toDF("g", "v")
    val got = StatOps.minMaxScale(d, "g", "v")
      .select($"g", $"v", $"scaled")
      .as[(String, Option[Double], Option[Double])].collect()
    val byV = got.filter(_._1 == "a").map(r => r._2 -> r._3).toMap
    assert(byV(Some(10.0)).contains(0.0) && byV(Some(20.0)).contains(1.0))
    assert(byV(Some(15.0)).contains(0.5) && byV(None).isEmpty)
    assert(got.filter(_._1 == "k").forall(_._3.contains(0.0))) // constant group
    val p = StatOps.minMaxScale(d, "g", "v").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"bounds must broadcast:\n$p")
  }

  test("minMaxScale and zscoreOutliers keep NULL-group rows (null-safe join)") {
    // r15 ADVICE: a plain === bounds join silently dropped NULL-key rows;
    // the null-safe <=> makes the NULL key its own group (SQL GROUP BY
    // semantics), preserving the "input plus scaled column" contract.
    import spark.implicits._
    val d = Seq((Some("a"), 10.0, 1L), (Some("a"), 20.0, 2L),
      (None, 3.0, 3L), (None, 7.0, 4L)).toDF("g", "v", "id")
    val scaled = StatOps.minMaxScale(d, "g", "v")
      .select($"g", $"v", $"scaled")
      .as[(Option[String], Double, Double)].collect().toSet
    assert(scaled == Set(
      (Some("a"), 10.0, 0.0), (Some("a"), 20.0, 1.0),
      (None, 3.0, 0.0), (None, 7.0, 1.0)), s"got $scaled")
    val z = StatOps.zscoreOutliers(d, "g", "v", "id", k = 2)
      .select($"g", $"id").as[(Option[String], Long)].collect().toSet
    assert(z.map(_._2) == Set(1L, 2L, 3L, 4L), s"NULL-group rows dropped: $z")
  }

  test("classBalance: balanced vs dominated groups; integers exact") {
    import spark.implicits._
    val d = (Seq.tabulate(40)(i => ("bal", s"c${i % 4}")) ++
      (Seq.fill(36)(("dom", "big")) ++ Seq.fill(4)(("dom", "small"))))
      .toDF("g", "cls")
    val got = graft.operators.CorpusOps.classBalance(d, "g", "cls")
      .select($"g", $"n", $"n_classes", $"sq_sum".cast("string"), $"simpson", $"enc")
      .as[(String, Long, Long, String, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val (_, bn, bc, bs, bSimp, bEnc) = got("bal")
    assert((bn, bc, BigInt(bs)) == ((40L, 4L, BigInt(4 * 100))))
    assert(bSimp == 400.0 / 1600.0 && bEnc == 4.0)
    val (_, dn, dc, ds, _, dEnc) = got("dom")
    assert((dn, dc, BigInt(ds)) == ((40L, 2L, BigInt(36 * 36 + 16))))
    assert(dEnc > 1.0 && dEnc < 1.3) // 90/10 -> effective ~1.22 classes
  }

  test("mode ≡ brute-force argmax with the smallest-value tie-break") {
    import spark.implicits._
    val rnd = new scala.util.Random(654)
    val data = Seq.tabulate(500)(_ => (s"g${rnd.nextInt(3)}", rnd.nextInt(7).toLong))
    val got = StatOps.mode(data.toDF("g", "v"), "g", "v")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val maxC = counts.values.max
      val modeV = counts.filter(_._2 == maxC).keys.min
      val (_, gv, gc, gn, gd) = got(g)
      assert((gv, gc, gn, gd) ==
        ((modeV, maxC, rows.size.toLong, counts.size.toLong)), g)
    }
    // explicit tie: values 1 and 2 both occur twice -> mode is 1
    val tie = Seq(("t", 2L), ("t", 1L), ("t", 2L), ("t", 1L), ("t", 5L))
      .toDF("g", "v")
    assert(StatOps.mode(tie, "g", "v")
      .select($"mode_value", $"mode_count").as[(Long, Long)].head() == ((1L, 2L)))
  }

  test("hist2d ≡ brute-force bucket counts; cells sum to n; single-value axes go to cell 0") {
    import spark.implicits._
    val rnd = new scala.util.Random(111)
    val data = Seq.tabulate(400)(_ =>
      ("g", rnd.nextInt(100).toDouble, rnd.nextInt(50).toDouble)) ++
      Seq.tabulate(5)(i => ("const", 3.0, i.toDouble))
    val got = StatOps.hist2d(data.toDF("g", "x", "y"), "g", "x", "y", 8, 8)
      .as[(String, Int, Int, Long)].collect()
    data.groupBy(_._1).foreach { case (g, rows) =>
      val xs = rows.map(_._2); val ys = rows.map(_._3)
      val (xmin, xmax) = (xs.min, xs.max)
      val (ymin, ymax) = (ys.min, ys.max)
      def bkt(v: Double, lo: Double, hi: Double): Int =
        if (hi == lo) 0
        else math.min(7, math.floor((v - lo) / (hi - lo) * 8).toInt)
      val expect = rows.groupBy(r => (bkt(r._2, xmin, xmax), bkt(r._3, ymin, ymax)))
        .map { case (k, v) => k -> v.size.toLong }
      val cells = got.filter(_._1 == g).map(r => (r._2, r._3) -> r._4).toMap
      assert(cells == expect, g)
      assert(cells.values.sum == rows.size.toLong, g)
    }
    // constant x axis lands everything in bx = 0
    assert(got.filter(_._1 == "const").forall(_._2 == 0))
  }

  test("trimmedMean ≡ brute-force sort-and-slice under heavy ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(909)
    val data = Seq.tabulate(500) { i =>
      (s"g${i % 4}", (rnd.nextInt(40) - 20).toDouble / 4.0)
    }
    val got = StatOps.trimmedMean(data.toDF("g", "v"), "g", "v", 1, 10)
      .select($"g", $"n", $"n_kept", $"trim_sum".cast("string"),
        $"trimmed_mean")
      .as[(String, Long, Long, String, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val q = rows.map(r => math.floor(r._2 * 10000.0 + 0.5).toLong).sorted
      val n = q.length
      val lo = n / 10
      val kept = q.slice(lo, n - lo)
      val sum = kept.map(BigInt(_)).sum
      val (_, gn, gk, gsum, gm) = got(g)
      assert((gn, gk, BigInt(gsum)) == ((n.toLong, kept.length.toLong, sum)), g)
      assert(gm.contains(
        java.lang.Double.parseDouble(sum.toString) /
          (kept.length.toDouble * 10000.0)), g)
    }
  }

  test("trimmedMean edges: tiny groups and full-trim NULL") {
    import spark.implicits._
    // n = 1 or 2 with p = 1/10: lo = 0, nothing trimmed
    val d = Seq(("a", 5.0), ("b", 1.0), ("b", 3.0)).toDF("g", "v")
    val got = StatOps.trimmedMean(d, "g", "v", 1, 10)
      .select($"g", $"n_kept", $"trimmed_mean")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 2)
    assert(got("a") == ((1L, Some(5.0))) && got("b")._1 == 2L)
    assertThrows[IllegalArgumentException](
      StatOps.trimmedMean(d, "g", "v", 1, 2)) // p must be < 1/2
  }

  test("ksDrift ≡ driver-side two-sample KS vs rest on the fixture") {
    import spark.implicits._
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"lang", $"n_chars").as[(String, Long)].collect()
    val all = d.map(_._2).sorted
    val got = StatOps.ksDrift(
        spark.read.parquet(s"$sf0001/documents.parquet")
          .select($"lang", $"n_chars"), "lang", "n_chars")
      .as[(String, Long, Long, String, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    d.groupBy(_._1).foreach { case (g, rows) =>
      val mine = rows.map(_._2)
      val rest = d.filter(_._1 != g).map(_._2)
      val levels = all.distinct
      val dNum = levels.map { v =>
        val cg = mine.count(_ <= v).toLong
        val cr = rest.count(_ <= v).toLong
        (BigInt(cg) * rest.length - BigInt(cr) * mine.length).abs
      }.max
      val (_, n, nRest, ksNum, ks) = got(g)
      assert(n == mine.length.toLong && nRest == rest.length.toLong, g)
      assert(BigInt(ksNum) == dNum, g)
      val expKs = java.lang.Double.parseDouble(dNum.toString) /
        java.lang.Double.parseDouble((BigInt(mine.length) * rest.length).toString)
      assert(ks.contains(expKs), g)
    }
  }

  test("ksDrift: identical distributions give 0; single group gives NULL") {
    import spark.implicits._
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("g", "v")
    val gotSame = StatOps.ksDrift(same, "g", "v")
      .as[(String, Long, Long, String, Option[Double])].collect()
    assert(gotSame.forall(_._5.contains(0.0)), gotSame.mkString(","))
    val single = Seq(("only", 5L), ("only", 7L)).toDF("g", "v")
    val gotSingle = StatOps.ksDrift(single, "g", "v")
      .as[(String, Long, Long, String, Option[Double])].head()
    assert(gotSingle._3 == 0L && gotSingle._5.isEmpty)
  }

  test("ksDrift enforces the grid bound: an unquantized wide domain fails loudly") {
    import spark.implicits._
    // 2 groups x 3 levels = 6 cells: over a 5-cell cap the call must fail
    // on the driver with the quantization hint, never build the grid.
    val d = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L)).toDF("g", "v")
    val e = intercept[IllegalArgumentException](
      StatOps.ksDrift(d, "g", "v", maxGridCells = 5L))
    assert(e.getMessage.contains("quantize"), e.getMessage)
    // at the bound it still runs
    assert(StatOps.ksDrift(d, "g", "v", maxGridCells = 6L).count() == 2)
    assertThrows[IllegalArgumentException](
      StatOps.ksDrift(d, "g", "v", maxGridCells = 0L))
  }
}
