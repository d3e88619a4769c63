package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.StatOps

class LinearFitSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .select($"l_returnflag", $"l_quantity", $"l_extendedprice")

  test("matches the built-in regr_slope/regr_intercept to float tolerance") {
    val got = StatOps.linearFit(li, Seq("l_returnflag"), "l_quantity", "l_extendedprice")
      .select($"l_returnflag", $"slope", $"intercept", $"r2")
      .as[(String, Double, Double, Double)].collect()
      .map { case (g, s, i, r) => g -> ((s, i, r)) }.toMap
    val ref = li.groupBy($"l_returnflag")
      .agg(regr_slope($"l_extendedprice", $"l_quantity").as("s"),
        regr_intercept($"l_extendedprice", $"l_quantity").as("i"),
        pow(corr($"l_quantity", $"l_extendedprice"), 2).as("r"))
      .as[(String, Double, Double, Double)].collect()
      .map { case (g, s, i, r) => g -> ((s, i, r)) }.toMap
    assert(got.keySet === ref.keySet)
    got.foreach { case (g, (s, i, r)) =>
      assert(math.abs(s / ref(g)._1 - 1.0) < 1e-9, s"slope $g")
      assert(math.abs(i / ref(g)._2 - 1.0) < 1e-6, s"intercept $g")
      assert(math.abs(r - ref(g)._3) < 1e-9 && r >= 0.0 && r <= 1.0, s"r2 $g")
    }
  }

  test("constant x gives null fit; fit is partition-invariant") {
    val df = Seq(("a", 1.0, 2.0), ("a", 1.0, 5.0)).toDF("g", "x", "y")
    val row = StatOps.linearFit(df, Seq("g"), "x", "y")
      .select($"slope", $"intercept", $"r2")
      .as[(Option[Double], Option[Double], Option[Double])].head()
    assert(row === ((None, None, None)))
    def run(d: org.apache.spark.sql.DataFrame) =
      StatOps.linearFit(d, Seq("l_returnflag"), "l_quantity", "l_extendedprice")
        .collect().map(_.toSeq).toSet
    assert(run(li) === run(li.repartition(11)))
  }
}
