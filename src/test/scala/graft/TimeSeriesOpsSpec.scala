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
}
