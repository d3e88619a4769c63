package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeriesOps

class TimeSeriesOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("holes densify and forward-fill; is_observed marks real rows") {
    val obs = Seq(
      ("u1", d("2024-01-01"), Some(10L)),
      ("u1", d("2024-01-04"), Some(40L)),
      ("u2", d("2024-02-01"), Some(1L))).toDF("k", "day", "v")
    val got = TimeSeriesOps.gapFill(obs, Seq("k"), "day", Seq("v"))
      .select($"k", $"day", $"v", $"is_observed")
      .as[(String, Date, Long, Boolean)].collect().toSet
    assert(got === Set(
      ("u1", d("2024-01-01"), 10L, true),
      ("u1", d("2024-01-02"), 10L, false),
      ("u1", d("2024-01-03"), 10L, false),
      ("u1", d("2024-01-04"), 40L, true),
      ("u2", d("2024-02-01"), 1L, true)))
  }

  test("an observed null fills from the older observation (documented ffill semantics)") {
    val obs = Seq(
      ("u", d("2024-01-01"), Some(7L)),
      ("u", d("2024-01-02"), None)).toDF("k", "day", "v")
    val got = TimeSeriesOps.gapFill(obs, Seq("k"), "day", Seq("v"))
      .select($"day", $"v", $"is_observed").as[(Date, Long, Boolean)].collect().toSet
    assert(got === Set((d("2024-01-01"), 7L, true), (d("2024-01-02"), 7L, true)))
  }

  test("multiple fill columns fill independently in one window") {
    val obs = Seq(
      ("u", d("2024-01-01"), Some(1L), None: Option[String]),
      ("u", d("2024-01-03"), None: Option[Long], Some("b"))).toDF("k", "day", "v", "s")
    val df = TimeSeriesOps.gapFill(obs, Seq("k"), "day", Seq("v", "s"))
    val got = df.select($"day", $"v", $"s")
      .as[(Date, Option[Long], Option[String])].collect().toSet
    assert(got === Set(
      (d("2024-01-01"), Some(1L), None),
      (d("2024-01-02"), Some(1L), None),
      (d("2024-01-03"), Some(1L), Some("b"))))
    // exactly ONE Window operator serves every fill column
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.sliding(7).count(_ == "Window ") === 1, plan)
  }

  test("single-observation keys produce exactly their own row") {
    val obs = Seq(("u", d("2024-03-15"), Some(5L))).toDF("k", "day", "v")
    assert(TimeSeriesOps.gapFill(obs, Seq("k"), "day", Seq("v")).count() === 1)
  }

  test("ewmaLast equals the sequential recurrence, independent of partitioning") {
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(23)
    val rows = Seq.tabulate(500)(_ =>
      (rng.nextInt(10).toLong, rng.nextInt(1000).toLong, rng.nextInt(100).toDouble))
      .distinct
    val alpha = 0.25
    def seqEwma(vs: Seq[Double]): Double =
      vs.tail.foldLeft(vs.head)((acc, v) => alpha * v + (1 - alpha) * acc)
    val exp = rows.groupBy(_._1).map { case (k, rs) =>
      val vs = rs.sortBy(r => (r._2, r._3)).map(_._3)
      k -> (vs.size.toLong, seqEwma(vs))
    }
    def run(parts: Int) = TimeSeriesOps.ewmaLast(
        rows.toDF("k", "o", "v").repartition(parts),
        Seq("k"), col("o"), Seq(col("v")), col("v"), alpha)
      .as[(Long, Int, Double)].collect()
      .map(r => r._1 -> (r._2.toLong, r._3)).toMap
    val got = run(3)
    assert(got === exp)        // exact double equality — fold order is fixed
    assert(got === run(11))
  }

  test("ewmaLast on a single observation returns it unchanged") {
    import org.apache.spark.sql.functions.col
    val got = TimeSeriesOps.ewmaLast(
        Seq((1L, 5L, 7.5)).toDF("k", "o", "v"),
        Seq("k"), col("o"), Seq.empty, col("v"), 0.25)
      .as[(Long, Int, Double)].collect()
    assert(got.toSeq === Seq((1L, 1, 7.5)))
  }

  test("cusum window identity ≡ the recursive reference on the fixture") {
    import org.apache.spark.sql.functions.{col, expr}
    val (ref, h) = (600000L, 2000000L)
    // The operator's own sort key (ts_µs, event_id), via the same
    // nanosecond-normalized accessor the gate uses.
    val keyed = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "ts div 1000 AS o", "event_id",
        "CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS LONG) AS vq")
      .as[(Long, Long, Long, Long)].collect()
    val expect = keyed.groupBy(_._1).map { case (u, g) =>
      var s = 0L; var a = 0L
      g.sortBy(r => (r._2, r._3)).foreach { r =>
        s = math.max(0L, s + r._4 - ref)
        if (s > h) a += 1
      }
      u -> ((g.length, s, a))
    }
    val got = TimeSeriesOps.cusum(
        graft.Tables.events(spark, sf0001),
        Seq("user_id"), expr("ts div 1000"), Seq(col("event_id")),
        col("value"), ref, h)
      .as[(Long, Int, Long, Long)].collect()
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { case (u, n, fin, over) =>
      assert(expect(u) == ((n, fin, over)), s"user $u")
    }
    assert(got.exists(_._4 > 0) && got.exists(_._4 == 0),
      "threshold must bite for some users and not others")
  }

  test("cusum hand case and partitioning invariance") {
    import org.apache.spark.sql.functions.col
    // v = 3, 10, 1 (e4 units), ref = 2, h = 5 → s: 1, 9, 8 → alarms 2
    val d = Seq((1L, 1L, 1L, 0.0003), (1L, 2L, 2L, 0.0010), (1L, 3L, 3L, 0.0001))
      .toDF("k", "o", "t", "v")
    def run(parts: Int) = TimeSeriesOps.cusum(d.repartition(parts),
        Seq("k"), col("o"), Seq(col("t")), col("v"), 2L, 5L)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(run(3) === Seq((1L, 3, 8L, 2L)))
    assert(run(3) === run(7))
  }

  test("acf ≡ brute-force BigInt reference on random series") {
    import spark.implicits._
    val rnd = new scala.util.Random(303)
    val rows = (0 until 3).flatMap { k =>
      Seq.tabulate(80) { i =>
        (s"k$k", i.toLong, i.toLong, (rnd.nextInt(2000) - 1000) / 100.0)
      }
    }
    val got = TimeSeriesOps.acf(rows.toDF("k", "o", "t", "v"),
        Seq("k"), col("o"), Seq(col("t")), col("v"), maxLag = 3)
      .select($"k", $"n", $"acf_den".cast("string"),
        $"c1".cast("string"), $"c2".cast("string"), $"c3".cast("string"),
        $"r1", $"r2", $"r3")
      .as[(String, Long, String, String, String, String,
        Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val v = g.sortBy(_._2).map(r => BigInt((r._4 * 10000).round))
      val n = BigInt(v.length)
      val sum = v.sum
      val u = v.map(x => n * x - sum)
      val den = u.map(x => x * x).sum
      def cL(lag: Int) = (0 until v.length - lag).map(i => u(i) * u(i + lag)).sum
      val (_, gn, gden, gc1, gc2, gc3, gr1, _, _) = got(k)
      assert(gn == v.length.toLong && BigInt(gden) == den, k)
      assert((BigInt(gc1), BigInt(gc2), BigInt(gc3)) == ((cL(1), cL(2), cL(3))), k)
      assert(gr1.contains(
        BigDecimal(cL(1)).toDouble / BigDecimal(den).toDouble), k)
    }
  }

  test("fanoFactor ≡ brute-force variance/mean of window counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(505)
    // bursty key: one hot window holds most events, the rest trickle;
    // regular key: exactly one event per window.
    val rows = Seq.tabulate(300)(i =>
      ("bursty", (if (i < 250) rnd.nextInt(5).toLong
                  else 100L + (i - 250) * 10L) * 1000000L)) ++
      Seq.tabulate(300)(i => ("regular", (i * 10L) * 1000000L))
    val got = TimeSeriesOps.fanoFactor(rows.toDF("k", "ts"),
        Seq("k"), col("ts"), windowSec = 10L)
      .select($"k", $"n_windows", $"n_events",
        $"fano_num".cast("string"), $"fano_den".cast("string"), $"fano")
      .as[(String, Long, Long, String, String, Double)]
      .collect().map(r => r._1 -> r).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val counts = g.groupBy(t => t._2 / 10000000L).values.map(_.size.toLong).toSeq
      val n = counts.length.toLong
      val sTot = counts.sum
      val cc = counts.map(c => c * c).sum
      val num = BigInt(n) * cc - BigInt(sTot) * sTot
      val den = BigInt(n) * sTot
      val (_, gn, gs, gnum, gden, gf) = got(k)
      assert((gn, gs, BigInt(gnum), BigInt(gden)) == ((n, sTot, num, den)), k)
      assert(gf == num.toDouble / den.toDouble, k)
    }
    assert(got("bursty")._6 > 5.0 && got("regular")._6 < 1.5)
  }

  test("acf degenerate: constant series and n <= lag report NULL r") {
    import spark.implicits._
    val d = Seq(
      ("const", 1L, 1L, 5.0), ("const", 2L, 2L, 5.0), ("const", 3L, 3L, 5.0),
      ("short", 1L, 1L, 1.0), ("short", 2L, 2L, 2.0))
      .toDF("k", "o", "t", "v")
    val got = TimeSeriesOps.acf(d, Seq("k"), col("o"), Seq(col("t")), col("v"))
      .select($"k", $"r1", $"r2", $"r3")
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("const")._2.isEmpty && got("const")._3.isEmpty)
    assert(got("short")._2.nonEmpty && got("short")._3.isEmpty &&
      got("short")._4.isEmpty)
  }

  test("acf detects a period-2 signal (r2 near 1, r1 near -1)") {
    import spark.implicits._
    val d = Seq.tabulate(100)(i => ("p", i.toLong, i.toLong,
      if (i % 2 == 0) 10.0 else -10.0)).toDF("k", "o", "t", "v")
    val (r1, r2) = TimeSeriesOps.acf(d, Seq("k"), col("o"), Seq(col("t")), col("v"))
      .select($"r1", $"r2").as[(Double, Double)].head()
    assert(r1 < -0.9 && r2 > 0.9)
  }
}
