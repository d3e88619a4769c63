package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VectorOps

class SemDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def emb: DataFrame =
    spark.read.parquet(s"$sf0001/embeddings.parquet").select($"vec_id", $"embedding")
  private def centroids: DataFrame = emb.filter($"vec_id" < 10)
  private def planted: DataFrame = emb.select(($"vec_id" + 1000000L).as("vec_id"),
    concat(array(element_at($"embedding", 1) * lit(2.0f)),
      slice($"embedding", 2, 63)).as("embedding"))

  test("pairs equal brute-force within-cluster cosine pairs") {
    val all = emb.unionByName(planted)
    val got = VectorOps.semDedupPairs(all, centroids, "vec_id", "embedding", 0.8)
      .select("id_i", "id_j").as[(Long, Long)].collect().toSet

    val asg = VectorOps.ivfAssign(all, centroids, "vec_id", "embedding").assignments
    val withVec = asg.join(all, asg("id") === all("vec_id")).select($"id", $"cluster_id", $"embedding")
    val brute = withVec.as("a").join(withVec.as("b"),
        col("a.cluster_id") === col("b.cluster_id") && col("a.id") < col("b.id"))
      .filter(VectorOps.cosine(col("a.embedding"), col("b.embedding")) >= 0.8)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    assert(got === brute && got.nonEmpty)
  }

  test("keep decision: originals always kept, drops are planted twins only") {
    val all = emb.unionByName(planted)
    val kept = VectorOps.semDedup(all, centroids, "vec_id", "embedding", 0.8)
      .as[(Long, Long, Boolean)].collect()
    assert(kept.length === all.count())
    val dropped = kept.filter(!_._3).map(_._1)
    assert(dropped.nonEmpty && dropped.forall(_ >= 1000000L)) // never an original
    // a dropped row's smaller-id near-dup must exist in the pair set
    val pairJ = VectorOps.semDedupPairs(all, centroids, "vec_id", "embedding", 0.8)
      .select("id_j").as[Long].collect().toSet
    assert(dropped.toSet === pairJ)
  }

  test("zero-norm vectors get a null cluster and are always kept") {
    val zero = Seq((999999942L, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val all = emb.unionByName(zero)
    val row = VectorOps.semDedup(all, centroids, "vec_id", "embedding", 0.8)
      .filter($"id" === 999999942L).select($"cluster_id".isNull, $"kept")
      .as[(Boolean, Boolean)].head()
    assert(row === ((true, true)))
  }

  test("threshold 1.0-ish keeps everything apart except exact duplicates") {
    val picked = emb.filter($"vec_id".between(20, 24)) // deterministic, unlike limit()
    val dup = picked.select(($"vec_id" + 500000L).as("vec_id"), $"embedding")
    val all = emb.unionByName(dup)
    val pairs = VectorOps.semDedupPairs(all, centroids, "vec_id", "embedding", 0.999999)
      .select("id_i", "id_j").as[(Long, Long)].collect().toSet
    assert(pairs === picked.select($"vec_id").as[Long].collect()
      .map(id => (id, id + 500000L)).toSet)
  }
}
