package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MultimodalOps, TextOps}

class MultimodalOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("decodeStub contract: length, header byte, rolling hash, frames") {
    val f = MultimodalOps.decodeStub("hello".getBytes("UTF-8"))
    assert(f.n_bytes === 5L)
    assert(f.first_byte === 'h'.toInt)
    assert(f.byte_hash === 99162322L) // == TextOps.polyHash("hello") for ASCII
    assert(f.n_frames === 1)
    val empty = MultimodalOps.decodeStub(Array.emptyByteArray)
    assert(empty.n_bytes === 0L && empty.first_byte === -1 && empty.n_frames === 1)
    assert(MultimodalOps.decodeStub(new Array[Byte](130)).n_frames === 3)
  }

  test("JVM byte hash equals the Catalyst polyHash on ASCII payloads") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(20)
    val viaExpr = docs.select($"doc_id", TextOps.polyHash($"text").as("h"))
      .as[(Long, Long)].collect().toMap
    val viaStub = MultimodalOps.extractFeatures(
        MultimodalOps.documentsAsMedia(spark, docs))
      .select($"doc_id", $"byte_hash").as[(Long, Long)].collect().toMap
    assert(viaStub === viaExpr)
  }

  test("extractFeatures is partition-parallel and schema-stable") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(50).repartition(7)
    val out = MultimodalOps.extractFeatures(MultimodalOps.documentsAsMedia(spark, docs))
    assert(out.rdd.getNumPartitions === 7) // mapPartitions preserves partitioning
    assert(out.columns.toSeq ===
      Seq("doc_id", "n_bytes", "first_byte", "byte_hash", "n_frames"))
    assert(out.count() === 50L)
  }
}
