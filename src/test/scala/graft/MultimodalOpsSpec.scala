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

  test("resize: nearest-neighbor index map for down-/up-sampling; empty stays empty") {
    import MultimodalOps.{MediaRecord, byteHash}
    implicit val sq = spark.sqlContext
    def media(rows: (Long, String)*) =
      spark.createDataset(rows.map { case (id, t) =>
        MediaRecord(id, t.getBytes("UTF-8"), t.length.toLong, "en") })
    // downsample 10 bytes -> 4: indices ⌊i·10/4⌋ = 0,2,5,7
    val down = "ABCDEFGHIJ"
    val expDown = Array(0, 2, 5, 7).map(down.getBytes("UTF-8")(_))
    // upsample 3 bytes -> 4: indices ⌊i·3/4⌋ = 0,0,1,2 (repeats, never OOB)
    val up = "XYZ"
    val expUp = Array(0, 0, 1, 2).map(up.getBytes("UTF-8")(_))
    val out = MultimodalOps.resize(media(1L -> down, 2L -> up, 3L -> ""), target = 4)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).n_in === 10L && out(1L).n_out === 4 &&
      out(1L).resized_hash === byteHash(expDown))
    assert(out(2L).n_in === 3L && out(2L).n_out === 4 &&
      out(2L).resized_hash === byteHash(expUp))
    assert(out(3L).n_in === 0L && out(3L).n_out === 0 &&
      out(3L).resized_hash === 0L)
  }

  test("null payloads are treated as empty by every consumer") {
    // A NULL source column encodes to a NULL payload array; the three
    // payload consumers must degrade to the empty-payload behavior instead
    // of NPE-ing the gate while the DuckDB oracle succeeds (r12 ADVICE).
    import MultimodalOps.MediaRecord
    implicit val sq = spark.sqlContext
    val media = spark.createDataset(Seq(
      MediaRecord(1L, null, 0L, "en"),
      MediaRecord(2L, "AB".getBytes("UTF-8"), 2L, "en")))
    val feats = MultimodalOps.extractFeatures(media)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes === 0L && feats(1L).first_byte === -1)
    assert(feats(2L).n_bytes === 2L)
    val frames = MultimodalOps.sampleFrames(media, frameSize = 1, stride = 1)
      .collect().groupBy(_.doc_id)
    assert(!frames.contains(1L) && frames(2L).length === 2)
    val resized = MultimodalOps.resize(media, target = 4)
      .collect().map(r => r.doc_id -> r).toMap
    assert(resized(1L).n_in === 0L && resized(1L).n_out === 0 &&
      resized(1L).resized_hash === 0L)
    assert(resized(2L).n_out === 4)
  }

  test("dHashNearDup ≡ brute-force all-pairs at maxHamming 7 (recall-1 regime)") {
    import MultimodalOps.MediaRecord
    implicit val sq = spark.sqlContext
    val rnd = new scala.util.Random(1515)
    // Clusters of near-identical payloads: a base byte array plus copies
    // with k in-place byte flips (same length — the dHash contract).
    val payloads = (0 until 12).flatMap { c =>
      val base = Array.fill(200)((rnd.nextInt(96) + 32).toByte)
      (0 until 4).map { v =>
        val arr = base.clone()
        (0 until v * 2).foreach(_ => arr(rnd.nextInt(arr.length)) =
          (rnd.nextInt(96) + 32).toByte)
        arr
      }
    }
    val media = spark.createDataset(payloads.zipWithIndex.map { case (p, i) =>
      MediaRecord(i.toLong, p, p.length.toLong, "en")
    })
    val bits = payloads.map(MultimodalOps.dHashBits)
    val expect = (for {
      i <- payloads.indices; j <- (i + 1) until payloads.length
      h = (0 until 64).count(b => bits(i)(b) != bits(j)(b))
      if h <= 7
    } yield (i.toLong, j.toLong, h.toLong)).toSet
    val got = MultimodalOps.dHashNearDup(media, maxHamming = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect) // banding loses nothing at Hamming <= 7
    assert(expect.nonEmpty)
  }

  test("dHashNearDup maxBucket: mega-bucket pairs drop, small-bucket pairs survive") {
    import MultimodalOps.MediaRecord
    implicit val sq = spark.sqlContext
    // 30 identical payloads (one mega-bucket per band) + one distinct
    // near-dup pair in its own small buckets.
    val hot = Array.fill(120)(65.toByte)
    val basePair = Array.tabulate(120)(i => ((i * 53 + 7) % 251).toByte)
    val pairB = basePair.clone(); pairB(0) = (pairB(0) ^ 1).toByte
    val media = spark.createDataset(
      (0 until 30).map(i => MediaRecord(i.toLong, hot, 120L, "en")) ++
        Seq(MediaRecord(100L, basePair, 120L, "en"),
          MediaRecord(101L, pairB, 120L, "en")))
    val capped = MultimodalOps.dHashNearDup(media, maxHamming = 7, maxBucket = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped.forall { case (i, j, _) => i >= 100L && j >= 100L },
      "mega-bucket pairs must be skipped")
    assert(capped.exists { case (i, j, _) => i == 100L && j == 101L },
      "small-bucket near-dup pair must survive the cap")
    val uncapped = MultimodalOps.dHashNearDup(media, maxHamming = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(uncapped.size >= capped.size + (30 * 29) / 2)
  }

  test("dHashes packs bits 0-31 into h0 and 32-63 into h1, non-negative halves") {
    import MultimodalOps.MediaRecord
    implicit val sq = spark.sqlContext
    val p = Array.tabulate(300)(i => ((i * 37 + 11) % 251).toByte)
    val media = spark.createDataset(Seq(MediaRecord(7L, p, 300L, "en"),
      MediaRecord(8L, null, 0L, "en")))
    val got = MultimodalOps.dHashes(media).collect().map(h => h.doc_id -> h).toMap
    val bits = MultimodalOps.dHashBits(p)
    val e0 = (0 until 32).map(j => bits(j).toLong << j).sum
    val e1 = (32 until 64).map(j => bits(j).toLong << (j - 32)).sum
    assert(got(7L).h0 == e0 && got(7L).h1 == e1)
    assert(got(7L).h0 >= 0L && got(7L).h1 >= 0L)
    assert(got(8L).h0 == 0L && got(8L).h1 == 0L) // NULL payload -> zero hash
  }
}
