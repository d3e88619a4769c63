package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RankOps

/** [[graft.operators.RankOps]] — scalable global ranking and its consumers.
  *
  * Correctness oracle in here is the single-partition window `row_number`
  * (fine at test scale; the operator exists precisely to avoid it at real
  * scale). The plan guard pins the property the implementation's
  * correctness ARGUMENT rests on: the counts aggregate and the final
  * projection must consume ONE shared range exchange (ReuseExchange /
  * AQE stage dedup), so both observe the same sampled partition bounds.
  */
class RankOpsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def skewed = {
    // 997 rows, skewed multi-modal values, unique tiebreak id; shuffled
    // input order so ranking cannot ride the input layout.
    val rows = (1 to 997).map { i =>
      val v = if (i % 7 == 0) 5L else (i % 13).toLong * 100
      (i.toLong, v, s"s${i % 31}")
    }
    spark.createDataset(rows).toDF("id", "v", "tag")
      .repartition(7, col("tag"))
  }

  test("globalRank equals the single-partition window row_number") {
    val df = skewed
    val got = RankOps.globalRank(df, Seq(col("v"), col("id")), "rnk",
        numPartitions = 5)
      .select($"id", $"rnk").as[(Long, Long)].collect().toMap
    val w = Window.orderBy(col("v"), col("id"))
    val exp = df.withColumn("rnk", row_number().over(w))
      .select($"id", $"rnk".cast("long")).as[(Long, Long)].collect().toMap
    assert(got.size === 997)
    assert(got === exp)
  }

  test("globalRank is a permutation of 1..n under the default partition count") {
    val got = RankOps.globalRank(skewed, Seq(col("v"), col("id")), "rnk")
      .select($"rnk").as[Long].collect().sorted
    assert(got === (1L to 997L).toArray)
  }

  test("globalRank is stable across repeated actions (offsets agree with bounds)") {
    // The hazard this guards: a two-job relational formulation re-samples
    // range bounds per execution, so the offsets table can disagree with
    // the data side's partitioning. zipWithIndex fixes bounds at RDD
    // construction; every action must observe the same ranks.
    val ranked = RankOps.globalRank(skewed, Seq(col("v"), col("id")), "rnk",
      numPartitions = 5)
    val a = ranked.select($"id", $"rnk").as[(Long, Long)].collect().toMap
    val b = ranked.select($"id", $"rnk").as[(Long, Long)].collect().toMap
    val c = ranked.filter($"rnk" <= 100).count()
    assert(a === b)
    assert(c === 100L)
  }

  test("globalRank under 90%-duplicate keys: correct ranks, no degenerate partition") {
    // The skew case range partitioning must survive: ties split across
    // partition boundaries on the unique tiebreak (the total order makes
    // that safe), so one hot value cannot funnel into one task.
    val n = 20000
    val rows = (1 to n).map(i => (i.toLong, if (i % 10 == 0) i.toLong else 7L))
    val df = rows.toDF("id", "v").repartition(13)
    val ranked = RankOps.globalRank(df, Seq(col("v"), col("id")), "rnk",
      numPartitions = 8)
    val got = ranked.select($"id", $"rnk").as[(Long, Long)].collect().toMap
    val exp = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got === exp)
    // partition balance: the hot value (~18k rows) must spread; with 8
    // target partitions no partition may hold more than half the data
    val sizes = ranked
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .groupBy($"p").count().as[(Int, Long)].collect().map(_._2)
    assert(sizes.max < n / 2,
      s"hot key must split across partitions, got sizes ${sizes.mkString(",")}")
  }

  test("sortedNeighborhoodPairs emits each within-window pair exactly once") {
    val df = skewed
    val w = 6
    val got = RankOps.sortedNeighborhoodPairs(df, Seq(col("v"), col("id")), w,
        numPartitions = 5)
      .select($"id_i", $"id_j", $"rank_dist")
      .as[(Long, Long, Int)].collect().sorted
    // brute force from the window rank
    val rw = Window.orderBy(col("v"), col("id"))
    val ranked = df.withColumn("rnk", row_number().over(rw))
      .select($"id", $"rnk").as[(Long, Int)].collect()
    val exp = (for {
      (ia, ra) <- ranked; (ib, rb) <- ranked
      if rb > ra && rb - ra < w
    } yield (ia, ib, rb - ra)).sorted
    assert(got.length === exp.length)
    assert(got === exp)
  }

  test("equidepthBins: bin sizes within 1, monotone in the value order, exact formula") {
    val df = skewed
    val k = 10
    val got = RankOps.equidepthBins(df, col("v"), Seq(col("id")), k, "b",
        numPartitions = 5)
      .select($"id", $"b").as[(Long, Int)].collect().toMap
    val rw = Window.orderBy(col("v"), col("id"))
    val exp = df.withColumn("rnk", row_number().over(rw))
      .select($"id", (($"rnk" - 1) * k).cast("long"))
      .as[(Long, Long)].collect()
      .map { case (id, num) => id -> (num / 997).toInt }.toMap
    assert(got === exp)
    val sizes = got.values.groupBy(identity).map(_._2.size)
    assert(sizes.max - sizes.min <= 1)
    assert(got.values.toSet === (0 until k).toSet)
  }
}
