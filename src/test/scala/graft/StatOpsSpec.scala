package graft

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
}
