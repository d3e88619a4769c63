package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.StatOps

class CountingMedianSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def disc(df: org.apache.spark.sql.DataFrame, g: String, v: String) =
    df.groupBy(col(g).as("grp"))
      .agg(expr(s"percentile_disc(0.5) WITHIN GROUP (ORDER BY CAST($v AS DECIMAL(18,4)))")
        .cast("decimal(18,4)").as("med"))
      .as[(String, BigDecimal)].collect().toMap

  test("equals percentile_disc on the fixture, any partitioning") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_returnflag", $"l_extendedprice")
    val want = disc(li, "l_returnflag", "l_extendedprice")
    def got(df: org.apache.spark.sql.DataFrame) =
      StatOps.countingMedian(df, "l_returnflag", "l_extendedprice", 0, 110000, 1100)
        .select($"grp", $"med").as[(String, BigDecimal)].collect().toMap
    assert(got(li) === want)
    assert(got(li.repartition(13)) === want)
  }

  test("out-of-range values clamp into edge bins but the median stays exact") {
    // range [0, 10) with almost all mass outside it — the answer must
    // still be the true median because the slice sort sees real values
    val rows = Seq.tabulate(101)(i => ("g", (i - 50).toDouble * 100)) // -5000..5000
    val df = rows.toDF("g", "v")
    val got = StatOps.countingMedian(df, "g", "v", 0, 10, 10)
      .select($"med").as[BigDecimal].head()
    assert(got === BigDecimal("0.0000"))
    val shifted = rows.map { case (g, v) => (g, v + 100) }.toDF("g", "v")
    assert(StatOps.countingMedian(shifted, "g", "v", 0, 10, 10)
      .select($"med").as[BigDecimal].head() === BigDecimal("100.0000"))
  }

  test("even-sized groups take the lower middle (disc convention); nulls ignored") {
    val df = Seq(("g", Some(1.0)), ("g", Some(2.0)), ("g", Some(3.0)),
      ("g", Some(4.0)), ("g", None)).toDF("g", "v")
    val r = StatOps.countingMedian(df, "g", "v", 0, 10, 10)
      .select($"n", $"med").as[(Long, BigDecimal)].head()
    assert(r === ((4L, BigDecimal("2.0000"))))
  }

  test("countingMedianLong on ⌊v·10⁴+0.5⌋ agrees with the decimal form ×10⁴") {
    // The gateable integer-units form must pick the same element as the
    // decimal form wherever HALF_UP and ⌊·+0.5⌋ coincide (all fixture
    // prices are positive with ≤ 2 decimals, so they always do here).
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_returnflag", $"l_extendedprice")
    val want = StatOps.countingMedian(li, "l_returnflag", "l_extendedprice",
        0, 110000, 1100)
      .select($"grp", ($"med" * 10000).cast("long")).as[(String, Long)]
      .collect().toMap
    val got = StatOps.countingMedianLong(
        li.select($"l_returnflag",
          floor($"l_extendedprice" * 10000.0 + 0.5).as("vi")),
        "l_returnflag", "vi", loI = 0L, hiI = 1100000000L, nBins = 1100)
      .select($"grp", $"med").as[(String, Long)].collect().toMap
    assert(got === want)
    // nulls ignored, lower middle on even groups, out-of-range clamps
    val df = Seq(("g", Some(12L)), ("g", Some(-5L)), ("g", Some(40L)),
      ("g", Some(7L)), ("g", None)).toDF("g", "vi")
    val r = StatOps.countingMedianLong(df, "g", "vi", 0L, 10L, 10)
      .select($"n", $"med").as[(Long, Long)].head()
    assert(r === ((4L, 7L)))
  }
}
