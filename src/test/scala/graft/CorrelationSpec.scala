package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.StatOps

class CorrelationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .select($"l_returnflag", $"l_quantity", $"l_extendedprice")

  test("matches the built-in corr/covar_samp to float tolerance") {
    val got = StatOps.correlation(li, Seq("l_returnflag"), "l_quantity", "l_extendedprice")
      .select($"l_returnflag", $"corr_xy", $"cov_samp")
      .as[(String, Double, Double)].collect().map { case (k, c, v) => k -> ((c, v)) }.toMap
    val ref = li.groupBy($"l_returnflag")
      .agg(corr($"l_quantity", $"l_extendedprice").as("c"),
        covar_samp($"l_quantity", $"l_extendedprice").as("v"))
      .as[(String, Double, Double)].collect().map { case (k, c, v) => k -> ((c, v)) }.toMap
    assert(got.keySet === ref.keySet)
    got.foreach { case (k, (c, v)) =>
      assert(math.abs(c - ref(k)._1) < 1e-9, s"corr $k")
      assert(math.abs(v / ref(k)._2 - 1.0) < 1e-9, s"cov $k")
      assert(math.abs(c) <= 1.0, "correlation stays in [-1, 1]")
    }
  }

  test("bit-identical across partitionings — the property corr() itself lacks") {
    def run(df: org.apache.spark.sql.DataFrame) =
      StatOps.correlation(df, Seq("l_returnflag"), "l_quantity", "l_extendedprice")
        .select($"l_returnflag", $"corr_xy", $"cov_samp")
        .as[(String, Double, Double)].collect().toSet
    assert(run(li) === run(li.repartition(13)))
  }

  test("zero variance nulls the correlation; single row nulls the covariance") {
    val df = Seq(("a", 1.0, 2.0), ("a", 1.0, 5.0), ("b", 3.0, 4.0))
      .toDF("g", "x", "y")
    val got = StatOps.correlation(df, Seq("g"), "x", "y")
      .select($"g", $"n", $"corr_xy", $"cov_samp")
      .as[(String, Long, Option[Double], Option[Double])].collect()
      .map { case (g, n, c, v) => g -> ((n, c, v)) }.toMap
    assert(got("a") === ((2L, None, Some(0.0))))  // x constant: corr null, cov 0
    assert(got("b") === ((1L, None, None)))
  }

  test("correlationMatrix pairs equal the pairwise correlation operator bit-exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(321)
    val d = Seq.tabulate(300)(_ => {
      val x = rnd.nextInt(1000) / 10.0
      (x, x * 2 + rnd.nextInt(100) / 10.0, rnd.nextInt(50) / 10.0)
    }).toDF("a", "b", "c")
    val m = StatOps.correlationMatrix(d, Seq("a", "b", "c"))
      .as[(String, String, Long, Option[Double])]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(m.size == 3)
    Seq(("a", "b"), ("a", "c"), ("b", "c")).foreach { case (x, y) =>
      val single = StatOps.correlation(d.withColumn("g", lit(1)),
          Seq("g"), x, y)
        .select(col("n"), col("corr_xy"))
        .as[(Long, Option[Double])].head()
      assert(m((x, y)) == single, s"($x, $y)")
    }
    assertThrows[IllegalArgumentException](StatOps.correlationMatrix(d, Seq("a")))
    assertThrows[IllegalArgumentException](
      StatOps.correlationMatrix(d, Seq("a", "a")))
  }

  test("correlationMatrix: a constant column yields NULL r against everything") {
    import spark.implicits._
    val d = Seq.tabulate(20)(i => (i.toDouble, 5.0)).toDF("a", "k")
    val m = StatOps.correlationMatrix(d, Seq("a", "k"))
      .select(col("corr_xy")).as[Option[Double]].head()
    assert(m.isEmpty)
  }

}
