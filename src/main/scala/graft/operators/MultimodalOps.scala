package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the pipeline as
  * opaque BINARY columns with typed metadata, and feature extraction runs
  * per-partition over the typed Dataset (the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage — same schema/batching contract, JVM-side).
  *
  * The decode step is a STUB by design: this container has no image/audio
  * codecs, so [[decodeStub]] derives deterministic pseudo-features from the
  * raw bytes (length, header byte, rolling byte-hash, 64-byte frame count).
  * A production decoder replaces ONLY that function; the Spark-side contract
  * — binary column in, flat feature rows out, partition-parallel, no driver
  * materialization — is the real, tested surface.
  */
object MultimodalOps {

  /** A media row: payload bytes + metadata traveling alongside. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], n_chars: Long, lang: String)

  /** Extracted features — flat columns, parquet/oracle-friendly. */
  case class MediaFeatures(
      doc_id: Long, n_bytes: Long, first_byte: Int, byte_hash: Long, n_frames: Int)

  /** Rolling polynomial hash over unsigned bytes — the byte-level twin of
    * [[TextOps.polyHash]] (same `·31 mod 1e9+7` recurrence, so for ASCII
    * payloads the oracle recomputes it from the source text), shared by
    * [[decodeStub]] and [[sampleFrames]].
    */
  def byteHash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xff)) % TextOps.Prime
      i += 1
    }
    h
  }

  /** Deterministic stand-in for a real media decoder (`???`-equivalent with
    * a checkable contract): derives pseudo-features from the raw payload
    * bytes — length, header byte, rolling [[byteHash]], frame count.
    */
  def decodeStub(bytes: Array[Byte]): MediaFeatures = {
    val h = byteHash(bytes)
    MediaFeatures(
      doc_id = -1L,
      n_bytes = bytes.length.toLong,
      first_byte = if (bytes.isEmpty) -1 else bytes(0) & 0xff,
      byte_hash = h,
      n_frames = bytes.length / 64 + 1)
  }

  /** A NULL source column encodes to a NULL payload array; every payload
    * consumer treats that as an empty payload (the oracle side sees the
    * same row, so the gates stay aligned if a fixture ever gains NULL
    * text — r12 ADVICE).
    */
  private def payloadOf(r: MediaRecord): Array[Byte] =
    if (r.payload == null) Array.emptyByteArray else r.payload

  /** Partition-parallel feature extraction over the typed Dataset. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => decodeStub(payloadOf(r)).copy(doc_id = r.doc_id)))
  }

  /** One sampled frame of a payload. */
  case class MediaFrame(doc_id: Long, frame_idx: Int, n_bytes: Int, frame_hash: Long)

  /** Frame sampling — the video/audio analogue of token sampling: cut the
    * payload into `frameSize`-byte frames and keep every `stride`-th one
    * (a real decoder would emit decoded frames; the cutting/striding/batch
    * contract is identical). Partition-parallel flatMap; output volume is
    * payload/(frameSize·stride), never a driver collect.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameSize: Int, stride: Int): Dataset[MediaFrame] = {
    require(frameSize > 0 && stride > 0)
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      payloadOf(r).grouped(frameSize).zipWithIndex.collect {
        case (frame, idx) if idx % stride == 0 =>
          MediaFrame(r.doc_id, idx, frame.length, byteHash(frame))
      }
    })
  }

  /** One resized payload row. */
  case class ResizedMedia(doc_id: Long, n_in: Long, n_out: Int, resized_hash: Long)

  /** Nearest-neighbor RESIZE of the payload to `target` samples — the 1-D
    * analogue of image nearest-neighbor resize, with the exact index map
    * real resizers use: `out[i] = in[⌊i·n/target⌋]` (down- AND up-sampling
    * both fall out of the same formula). A production decoder swaps the
    * byte source for a pixel buffer; the index arithmetic, the
    * partition-parallel stage shape, and the determinism contract are the
    * tested surface. Empty payloads resize to empty (hash 0).
    */
  def resize(media: Dataset[MediaRecord], target: Int): Dataset[ResizedMedia] = {
    require(target > 0, s"target must be positive, got $target")
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val payload = payloadOf(r)
      val n = payload.length
      val out =
        if (n == 0) Array.empty[Byte]
        else Array.tabulate(target)(i => payload((i.toLong * n / target).toInt))
      ResizedMedia(r.doc_id, n.toLong, out.length, byteHash(out))
    })
  }

  /** documents → MediaRecord dataset: UTF-8 payload + metadata columns.
    * (Real pipelines read the bytes from object storage; the fixture has no
    * binary table, so the payload is derived — the column shapes are the
    * point.)
    */
  def documentsAsMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      col("n_chars").cast("long").as("n_chars"),
      col("lang")).as[MediaRecord]
  }

  /** A payload's 64-bit difference hash, packed as two 32-bit halves
    * (h0 = bits 0–31, h1 = bits 32–63) — the [[graft.operators.VectorOps]]
    * BQ convention: neither ANSI long arithmetic nor DuckDB `<< 63` can
    * build the sign bit, so a single long is the one packing the oracle
    * could NOT reproduce.
    */
  case class MediaDHash(doc_id: Long, h0: Long, h1: Long)

  /** 64-bit DIFFERENCE hash (dHash — Krawetz's gradient perceptual hash,
    * the image-dedup workhorse) over the payload byte stream: 65 evenly
    * sampled bytes s_j = payload[⌊j·n/65⌋], bit j = (s_j > s_{j+1}).
    * A real image pipeline samples a decoded 8×9 luminance grid instead of
    * raw bytes — swap [[dHashBits]]'s sampler, keep everything downstream
    * (the [[decodeStub]] contract). Empty/NULL payloads hash to all-zero
    * bits.
    */
  def dHashBits(bytes: Array[Byte]): Array[Int] = {
    val n = bytes.length
    val bits = new Array[Int](64)
    if (n > 0) {
      var j = 0
      while (j < 64) {
        val a = bytes((j.toLong * n / 65L).toInt) & 0xff
        val b = bytes(((j + 1).toLong * n / 65L).toInt) & 0xff
        bits(j) = if (a > b) 1 else 0
        j += 1
      }
    }
    bits
  }

  /** Partition-parallel [[dHashBits]] over the typed Dataset. */
  def dHashes(media: Dataset[MediaRecord]): Dataset[MediaDHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val bits = dHashBits(payloadOf(r))
      var h0 = 0L
      var h1 = 0L
      var j = 0
      while (j < 32) { h0 |= bits(j).toLong << j; j += 1 }
      while (j < 64) { h1 |= bits(j).toLong << (j - 32); j += 1 }
      MediaDHash(r.doc_id, h0, h1)
    })
  }

  /** Perceptual-hash NEAR-DUP pairs over binary payloads — the multimodal
    * member of the dedup family (MinHash/SimHash dedup text; this is the
    * shape an image/video pipeline runs on decoded media): payloads whose
    * [[dHashes]] differ in at most `maxHamming` of 64 bits. Candidates
    * come ONLY from a banded equi-join — the 64 bits split into 8 bands of
    * 8; by pigeonhole any pair within Hamming distance < 8 shares at least
    * one intact band, so for `maxHamming` ≤ 7 the banding has RECALL 1
    * (checked) while never forming cross-band pairs. The exact Hamming
    * distance then verifies each candidate via two 32-bit XOR popcounts.
    * Same scale posture as [[graft.operators.SimHash]]: band buckets bound
    * the candidate volume; no all-pairs stage anywhere.
    *
    * Output: (doc_i, doc_j, hamming), doc_i < doc_j, one row per pair.
    *
    * @param maxBucket skip band buckets larger than this before pair
    *   generation — the LSH hub-bucket guard. On low-entropy payloads a
    *   band value can collect tens of thousands of hashes (measured at
    *   sf10: ~2 000 distinct band values over 1 M synthetic docs ⇒
    *   Σ C(c,2) ≈ 3.9·10¹⁰ candidates, ~all false — the wall is the
    *   candidate volume, not the verify). A skipped bucket only loses
    *   pairs whose EVERY intact band is oversized — i.e. members of
    *   degenerate near-identical mega-clusters, which production
    *   pipelines route to exact clustering (or drop as boilerplate)
    *   rather than pairwise-enumerate. Default ∞ keeps the strict
    *   recall-1 contract.
    */
  def dHashNearDup(media: Dataset[MediaRecord], maxHamming: Int,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"maxHamming must be in [0, 7] (8-band recall-1 regime), got $maxHamming")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val h = dHashes(media).toDF()
    val bandCols = (0 until 8).map { k =>
      val src = if (k < 4) col("h0") else col("h1")
      struct(lit(k).as("bk"),
        shiftright(src, (k % 4) * 8).bitwiseAND(lit(255L)).as("bv"))
    }
    val bands0 = h.select(col("doc_id"), col("h0"), col("h1"),
        explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("h0"), col("h1"),
        col("b.bk").as("bk"), col("b.bv").as("bv"))
    val bands =
      if (maxBucket == Int.MaxValue) bands0
      else {
        val sizes = bands0.groupBy(col("bk"), col("bv"))
          .agg(count(lit(1)).as("graft_bc"))
          .filter(col("graft_bc") <= maxBucket)
          .select(col("bk"), col("bv"))
        bands0.join(sizes, Seq("bk", "bv"))
      }
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bk") === col("b.bk") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_i"), col("b.doc_id").as("doc_j"),
        col("a.h0").as("ah0"), col("a.h1").as("ah1"),
        col("b.h0").as("bh0"), col("b.h1").as("bh1"))
      .distinct()
    cand.withColumn("hamming",
        (bit_count(col("ah0").bitwiseXOR(col("bh0"))) +
          bit_count(col("ah1").bitwiseXOR(col("bh1")))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_i"), col("doc_j"), col("hamming"))
  }
}
