package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.StatOps

class HistogramQuantilesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .select($"l_returnflag", $"l_extendedprice")
  private val qs = Seq((1, 4), (1, 2), (3, 4), (9, 10))

  test("each exact percentile_disc value falls inside the selected bin") {
    val got = StatOps.histogramQuantiles(li, "l_returnflag", "l_extendedprice",
        lo = 0, hi = 110000, nBins = 1100, qs = qs)
      .select($"grp", $"q_num", $"q_den", $"lo_edge", $"hi_edge")
      .as[(String, Int, Int, Double, Double)].collect()
    assert(got.length === 3 * qs.length)
    val exact = qs.map { case (n, d) =>
      (n, d) -> li.groupBy($"l_returnflag")
        .agg(expr(s"percentile_disc(${n.toDouble / d}) WITHIN GROUP (ORDER BY l_extendedprice)").as("v"))
        .as[(String, Double)].collect().toMap
    }.toMap
    got.foreach { case (g, n, d, loE, hiE) =>
      val v = exact((n, d))(g)
      assert(v >= loE && v < hiE, s"grp=$g q=$n/$d exact=$v not in [$loE, $hiE)")
    }
  }

  test("identical across partitionings") {
    def run(df: org.apache.spark.sql.DataFrame) =
      StatOps.histogramQuantiles(df, "l_returnflag", "l_extendedprice",
        0, 110000, 1100, qs).collect().map(_.toSeq).toSet
    assert(run(li) === run(li.repartition(17)))
  }

  test("out-of-range values clamp to the edge bins") {
    val df = Seq(("g", -5.0), ("g", 0.5), ("g", 99.0), ("g", 250.0)).toDF("k", "v")
    val got = StatOps.histogramQuantiles(df, "k", "v", 0, 100, 10, Seq((0, 1), (1, 1)))
      .select($"q_num", $"bin").as[(Int, Long)].collect().toMap
    assert(got(0) === 0L) // -5 clamps into bin 0
    assert(got(1) === 9L) // 250 clamps into the last bin
  }

  test("uneven span is rejected") {
    val ex = intercept[IllegalArgumentException] {
      StatOps.histogramQuantiles(li, "l_returnflag", "l_extendedprice",
        0, 100.0001, 3, qs)
    }
    assert(ex.getMessage.contains("divide evenly"))
  }
}
