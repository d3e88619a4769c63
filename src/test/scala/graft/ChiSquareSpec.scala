package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.StatOps

class ChiSquareSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("hand-computed 2x2 table") {
    // o = [[10, 20], [30, 40]]; classic textbook arithmetic
    val rows = Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
      Seq.fill(30)(("r2", "c1")) ++ Seq.fill(40)(("r2", "c2"))
    val got = StatOps.chiSquare(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Double)].head()
    val expected = {
      val (n, r1, r2, c1, c2) = (100.0, 30.0, 70.0, 40.0, 60.0)
      def t(o: Double, e: Double) = (o - e) * (o - e) / e
      t(10, r1 * c1 / n) + t(20, r1 * c2 / n) + t(30, r2 * c1 / n) + t(40, r2 * c2 / n)
    }
    assert(got._1 === 100L && got._4 === 1L)
    assert(math.abs(got._5 - expected) < 1e-12)
  }

  test("perfectly proportional table gives chi2 = 0") {
    val rows = Seq.fill(10)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(30)(("y", "u")) ++ Seq.fill(60)(("y", "v"))
    val got = StatOps.chiSquare(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(got._5 === 0.0)
  }

  test("deterministic across partitionings on the fixture") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      StatOps.chiSquare(df, "lang", "source")
        .as[(Long, Long, Long, Long, Double)].head()
    val a = run(d)
    val b = run(d.repartition(9))
    assert(a === b)
    assert(java.lang.Double.doubleToLongBits(a._5) ===
      java.lang.Double.doubleToLongBits(b._5))
  }
}
