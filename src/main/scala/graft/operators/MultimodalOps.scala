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
}
