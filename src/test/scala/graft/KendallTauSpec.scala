package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.StatOps

/** [[StatOps.kendallTau]] against the O(n²) pairwise definition: the grid
  * decomposition (histogram cross term + per-bucket Fenwick sweeps) must be
  * EXACT for every pair class, for any bucket count, under heavy ties, and
  * invariant to partitioning — the properties the gate's hash compare
  * depends on.
  */
class KendallTauSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** All five pair classes plus tau_b by brute force. */
  private def brute(rows: Seq[(Double, Double)])
      : (Long, Long, Long, Long, Long, Long, Option[Double]) = {
    val n = rows.length.toLong
    var nc, nd, tx, ty, txy = 0L
    for (i <- rows.indices; j <- (i + 1) until rows.length) {
      val (xi, yi) = rows(i)
      val (xj, yj) = rows(j)
      val sx = java.lang.Double.compare(xi, xj)
      val sy = java.lang.Double.compare(yi, yj)
      if (sx == 0) tx += 1
      if (sy == 0) ty += 1
      if (sx == 0 && sy == 0) txy += 1
      if (sx * sy > 0) nc += 1
      if (sx * sy < 0) nd += 1
    }
    val t = n * (n - 1) / 2
    val tau = if (t - tx == 0 || t - ty == 0) None
    else Some((nc - nd).toDouble /
      math.sqrt((t - tx).toDouble * (t - ty).toDouble))
    (n, nc, nd, tx, ty, txy, tau)
  }

  private def check(data: Seq[(String, Double, Double)], buckets: Int): Unit = {
    val got = StatOps.kendallTau(data.toDF("g", "x", "y"), "g", "x", "y", buckets)
      .as[(String, Long, Long, Long, Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val grouped = data.groupBy(_._1)
    assert(got.size == grouped.size, s"buckets=$buckets")
    grouped.foreach { case (g, rows) =>
      val (n, nc, nd, tx, ty, txy, tau) = brute(rows.map(r => (r._2, r._3)))
      val (_, gn, gnc, gnd, gtx, gty, gtxy, gtau) = got(g)
      assert((gn, gnc, gnd, gtx, gty, gtxy) == ((n, nc, nd, tx, ty, txy)),
        s"group $g buckets=$buckets")
      assert(gtau == tau, s"group $g buckets=$buckets (bit-exact tau)")
    }
  }

  test("kendallTau ≡ brute force under heavy ties, for 1/3/8/64 buckets") {
    val rnd = new scala.util.Random(20260815)
    // Small value ranges force many ties in x, y, and both.
    val data = Seq.tabulate(500) { i =>
      (s"g${i % 4}", rnd.nextInt(12).toDouble, rnd.nextInt(9).toDouble)
    }
    Seq(1, 3, 8, 64).foreach(b => check(data, b))
  }

  test("kendallTau ≡ brute force on continuous (tie-free) values") {
    val rnd = new scala.util.Random(99)
    val data = Seq.tabulate(400) { i =>
      val x = rnd.nextDouble() * 100
      // monotone-but-noisy relation so nc ≫ nd
      (s"g${i % 3}", x, x * x + rnd.nextDouble() * 500)
    }
    Seq(2, 16).foreach(b => check(data, b))
  }

  test("kendallTau on the documents fixture ≡ brute force (the gate's frame)") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"lang", $"n_chars".cast("double").as("x"),
        size(split($"text", " ")).cast("double").as("y"))
      .where($"x".isNotNull && $"y".isNotNull)
    val rows = d.as[(String, Double, Double)].collect()
    check(rows.toSeq, 8)
  }

  test("kendallTau is partitioning-invariant (bit-exact)") {
    val rnd = new scala.util.Random(7)
    val data = Seq.tabulate(300) { i =>
      (s"g${i % 2}", rnd.nextInt(20).toDouble, rnd.nextInt(20).toDouble)
    }
    val a = StatOps.kendallTau(data.toDF("g", "x", "y").repartition(13),
      "g", "x", "y", 8).orderBy($"g").collect().toSeq
    val b = StatOps.kendallTau(data.toDF("g", "x", "y").coalesce(1),
      "g", "x", "y", 8).orderBy($"g").collect().toSeq
    assert(a == b)
  }

  test("kendallTau degenerate groups: constant side and n=1 report NULL tau") {
    val d = Seq(
      ("const_x", 5.0, 1.0), ("const_x", 5.0, 2.0), ("const_x", 5.0, 3.0),
      ("single", 1.0, 1.0),
      ("perfect", 1.0, 1.0), ("perfect", 2.0, 2.0), ("perfect", 3.0, 3.0))
      .toDF("g", "x", "y")
    val got = StatOps.kendallTau(d, "g", "x", "y", 4)
      .as[(String, Long, Long, Long, Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("const_x")._8.isEmpty && got("const_x")._5 == 3L) // tx = C(3,2)
    assert(got("single")._8.isEmpty && got("single")._2 == 1L)
    assert(got("perfect")._8.contains(1.0) && got("perfect")._3 == 3L)
  }

  test("spearman ≡ brute-force midrank reference under heavy ties") {
    val rnd = new scala.util.Random(2024)
    val data = Seq.tabulate(400) { i =>
      (s"g${i % 3}", rnd.nextInt(15).toDouble, rnd.nextInt(10).toDouble)
    }
    val got = StatOps.spearman(data.toDF("g", "x", "y"), "g", "x", "y")
      .select($"g", $"n", $"sxy".cast("string"), $"sxx".cast("string"),
        $"syy".cast("string"), $"rho")
      .as[(String, Long, String, String, String, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      def midrank2(vs: Seq[Double]): Map[Double, Long] = {
        val sorted = vs.sorted
        vs.distinct.map { v =>
          val cum = sorted.count(_ < v).toLong
          val m = sorted.count(_ == v).toLong
          v -> (2 * cum + m + 1)
        }.toMap
      }
      val n = rows.length.toLong
      val rx = midrank2(rows.map(_._2))
      val ry = midrank2(rows.map(_._3))
      val u = rows.map(r => (BigInt(rx(r._2) - (n + 1)), BigInt(ry(r._3) - (n + 1))))
      assert(u.map(_._1).sum == 0 && u.map(_._2).sum == 0) // exact centering
      val sxy = u.map { case (a, b) => a * b }.sum
      val sxx = u.map { case (a, _) => a * a }.sum
      val syy = u.map { case (_, b) => b * b }.sum
      val (_, gn, gsxy, gsxx, gsyy, grho) = got(g)
      assert((gn, BigInt(gsxy), BigInt(gsxx), BigInt(gsyy)) ==
        ((n, sxy, sxx, syy)), g)
      val rho = BigDecimal(sxy).toDouble /
        math.sqrt(BigDecimal(sxx).toDouble * BigDecimal(syy).toDouble)
      assert(grho.contains(rho), g)
    }
  }

  test("spearman: monotone data gives rho 1; constant side gives NULL") {
    val mono = Seq.tabulate(50)(i => ("m", i.toDouble, (i * i).toDouble))
    val const = Seq.tabulate(5)(i => ("c", 1.0, i.toDouble))
    val got = StatOps.spearman((mono ++ const).toDF("g", "x", "y"), "g", "x", "y")
      .select($"g", $"rho").as[(String, Option[Double])]
      .collect().toMap
    assert(got("m").contains(1.0))
    assert(got("c").isEmpty)
  }

  test("kendallTau drops NULL and NaN measures") {
    val d = Seq(
      ("g", Some(1.0), Some(1.0)), ("g", Some(2.0), Some(2.0)),
      ("g", None, Some(3.0)), ("g", Some(Double.NaN), Some(4.0)))
      .toDF("g", "x", "y")
    val got = StatOps.kendallTau(d, "g", "x", "y", 4)
      .select($"n", $"nc").as[(Long, Long)].head()
    assert(got == ((2L, 1L)))
  }
}
