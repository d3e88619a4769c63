package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VectorOps

class DotProductSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("compiled dot is bit-identical to the interpreted fold on real pairs") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter($"vec_id" < 40).select($"vec_id", $"embedding")
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
    val rows = pairs.select(
        VectorOps.dot(col("a.embedding"), col("b.embedding")).as("fast"),
        VectorOps.dotHof(col("a.embedding"), col("b.embedding")).as("slow"))
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    // exact bit equality, not tolerance — the whole determinism contract
    rows.foreach { case (f, s) =>
      assert(java.lang.Double.doubleToLongBits(f) ===
        java.lang.Double.doubleToLongBits(s))
    }
  }

  test("norm2 matches its HOF twin bit-for-bit") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
    val rows = e.select(VectorOps.norm2($"embedding").as("fast"),
        VectorOps.norm2Hof($"embedding").as("slow"))
      .as[(Double, Double)].collect()
    rows.foreach { case (f, s) =>
      assert(java.lang.Double.doubleToLongBits(f) ===
        java.lang.Double.doubleToLongBits(s))
    }
  }

  test("degenerate pairings: length mismatch and null elements are null; empty is 0") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),       // 11.0
      (2L, Seq(1.0f, 2.0f), Seq(3.0f)),             // length mismatch -> null
      (3L, Seq.empty[Float], Seq.empty[Float]))     // empty fold -> seed 0.0
      .toDF("id", "a", "b")
    val got = df.select($"id", VectorOps.dot($"a", $"b").as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got === Map(1L -> Some(11.0), 2L -> None, 3L -> Some(0.0)))
    val withNull = Seq((Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))))
      .toDF("a", "b")
      .select(VectorOps.dot($"a", $"b")).as[Option[Double]].head()
    assert(withNull.isEmpty)
    // the HOF twin agrees on every degenerate case
    val twin = df.select($"id", VectorOps.dotHof($"a", $"b").as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(twin === got)
  }

  test("mixed float x double arrays widen exactly") {
    val df = Seq((Seq(0.1f, 0.2f), Seq(0.3, 0.4))).toDF("a", "b")
    val (f, s) = df.select(VectorOps.dot($"a", $"b").as("f"),
        VectorOps.dotHof($"a", $"b").as("s"))
      .as[(Double, Double)].head()
    assert(java.lang.Double.doubleToLongBits(f) === java.lang.Double.doubleToLongBits(s))
  }
}
