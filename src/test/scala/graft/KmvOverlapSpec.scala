package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Sketches, TextOps}

class KmvOverlapSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def hashes = spark.read.parquet(s"$sf0001/documents.parquet")
    .filter($"text".isNotNull)
    .select($"doc_id", TextOps.polyHash($"text").as("h"))

  test("kmvMinima is the sorted bottom-k of the distinct hash set, any partitioning") {
    val k = 16
    val brute = hashes.select($"h").distinct().orderBy($"h")
      .limit(k).as[Long].collect().toSeq
    def got(df: org.apache.spark.sql.DataFrame) =
      df.agg(Sketches.kmvMinima($"h", k).as("m")).select($"m")
        .as[Seq[Long]].head()
    assert(got(hashes) === brute)
    assert(got(hashes.repartition(7)) === brute)
  }

  test("minima agree with KmvSketch's kth hash") {
    val r = hashes.agg(Sketches.kmvMinima($"h", 64).as("m"),
        Sketches.kmvDistinct($"h", 64).as("s"))
      .select($"m", $"s.kth_hash").as[(Seq[Long], Long)].head()
    assert(r._1.last === r._2 && r._1.length === 64)
  }

  test("unsaturated overlap is exact") {
    val a = Seq(1L, 2L, 3L, 4L).toDF("h").agg(Sketches.kmvMinima($"h", 64).as("am"))
    val b = Seq(3L, 4L, 5L).toDF("h").agg(Sketches.kmvMinima($"h", 64).as("bm"))
    val o = a.crossJoin(b)
      .select(Sketches.kmvOverlap($"am", $"bm", 64).as("o")).select("o.*")
      .as[(Int, Long, Double, Int, Double)].head()
    assert(o === ((5, 5L, 5.0, 2, 2.0))) // |A∪B|=5, |A∩B|=2, kth = max = 5
  }

  test("saturated estimates land near the exact truth on planted 50% overlap") {
    val k = 64
    val a = hashes.filter($"doc_id" % 2 === 0)
    val b = hashes.filter($"doc_id" % 3 === 0)
    val exactU = hashes.filter($"doc_id" % 2 === 0 || $"doc_id" % 3 === 0)
      .select($"h").distinct().count().toDouble
    val exactI = hashes.filter($"doc_id" % 6 === 0)
      .select($"h").distinct().count().toDouble
    val o = a.agg(Sketches.kmvMinima($"h", k).as("am"))
      .crossJoin(b.agg(Sketches.kmvMinima($"h", k).as("bm")))
      .select(Sketches.kmvOverlap($"am", $"bm", k).as("o")).select("o.*")
      .as[(Int, Long, Double, Int, Double)].head()
    assert(o._1 === k)
    assert(math.abs(o._3 / exactU - 1.0) < 0.5, s"union est ${o._3} vs $exactU")
    assert(math.abs(o._5 / exactI - 1.0) < 0.6, s"intersection est ${o._5} vs $exactI")
  }
}
