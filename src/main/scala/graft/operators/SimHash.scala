package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document signatures: each token votes ±1 per signature bit
  * according to its hash; a bit is set when the vote sum is positive. Docs
  * differing by a few tokens land within small Hamming distance.
  *
  * Pure per-row Catalyst expression (no shuffle, no UDF). Bits are unrolled
  * at plan-build time (`bits` is a Scala constant), so `shiftright(h, b)`
  * uses literal shift amounts — identical semantics to the DuckDB oracle's
  * `(h >> b) & 1`.
  *
  * Scale: signature computation is embarrassingly parallel; banded
  * candidate generation ([[bandKey]]) turns near-dup search into an
  * equi-join on signature bytes, same posture as [[MinHashLsh]].
  */
object SimHash {

  /** Token-hash array (ARRAY<BIGINT>) — SimHash votes use multiplicity:
    * repeated tokens vote once per occurrence. Compiled
    * ([[graft.functions.TokenHashes]]); the interpreted
    * `transform(tokens, polyHash)` twin is pinned in TokenHashesSpec.
    */
  def tokenHashes(text: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.TokenHashes(
        org.apache.spark.sql.graft.bridge.expression(text), wide = false))

  /** [[tokenHashes]] with the 60-informative-bit two-base combination
    * ([[TextOps.wideHash]] applied per token, one compiled pass, zero
    * per-token string allocation) — the de-GC'd grouping key for token-count
    * pipelines whose OUTPUT never contains the token string (r20 VERDICT
    * item 2: [[CorpusOps.tokenDrift]] / [[CorpusOps.tokenShift]] /
    * [[CorpusOps.tokenizeToIds]]). The 30-bit [[tokenHashes]] births
    * collisions at ~2¹⁵ distinct tokens — far below a real vocabulary; 60
    * bits is collision-free in practice for any corpus this engine meets.
    * Bit-identical to `transform(tokens(text), wideHash)` (TokenHashesSpec).
    */
  def tokenWideHashes(text: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.TokenHashes(
        org.apache.spark.sql.graft.bridge.expression(text), wide = true))

  /** SimHash of a precomputed token-hash array column. `bits` ≤ 62.
    *
    * Votes read the PHYSICAL bit (`(h >> b) & 1`), not `% 2`: remainder
    * semantics return {0, −1} for negative hashes, silently treating every
    * bit of a negative hash (e.g. xxhash64 output) as clear — and diverging
    * from [[signatures]], which counts set bits. Both formulations use the
    * same `& 1` read so they agree for arbitrary 64-bit hashes (SimHashSpec).
    */
  def simhashOf(th: Column, bits: Int = 32): Column =
    (0 until bits).map { b =>
      val vote = aggregate(th, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  def simhash(text: Column, bits: Int = 32): Column = simhashOf(tokenHashes(text), bits)

  /** Compiled form of [[simhashOf]] — one per-row fold
    * ([[graft.functions.SimHashSig]]) instead of `bits` interpreted HOF
    * lambdas; same physical-bit vote, null/empty → 0 (the [[signatures]]
    * contract; equivalence pinned in SimHashSpec).
    */
  def simhashFast(th: Column, bits: Int): Column =
    coalesce(
      org.apache.spark.sql.graft.bridge.column(
        graft.functions.SimHashSig(
          org.apache.spark.sql.graft.bridge.expression(th), bits)),
      lit(0L))

  /** DataFrame-level signature computation for bulk use: ONE compiled
    * per-row fold ([[graft.functions.SimHashSig]]) — zero shuffle, fully
    * parallel (the historical shapes both paid something: the interpreted
    * [[simhashOf]] HOF ran one interpreted lambda per BIT per row; the
    * explode → 60-SUM hash aggregate it replaced kept codegen but shuffled
    * 60-column partial state per document). Identical semantics to
    * [[simhashOf]]'s ±1 physical-bit vote, pinned in SimHashSpec (negative
    * hashes, null/empty → all-zero signature).
    */
  def signatures(docs: DataFrame, idCol: String, th: Column, bits: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      coalesce(
        org.apache.spark.sql.graft.bridge.column(
          graft.functions.SimHashSig(
            org.apache.spark.sql.graft.bridge.expression(th), bits)),
        lit(0L)).as("sig"))

  /** Band key for bucketed near-dup candidate generation: `bandBits`-wide
    * slice `band` of the signature. Two docs agreeing on any band become a
    * candidate pair — equi-joinable, no all-pairs scan.
    */
  def bandKey(sim: Column, band: Int, bandBits: Int = 8): Column =
    shiftright(sim, band * bandBits) % (1L << bandBits)

  /** SimHash near-dup pairs: banded candidate generation + exact Hamming
    * verification. With `bands = bits / bandBits` bands, any pair within
    * Hamming distance `maxHamming <= bands - 1` leaves at least one band
    * untouched (pigeonhole), so banded recall at the verify threshold is
    * exactly 1 and the result equals a brute-force all-pairs scan — which is
    * what the DuckDB oracle runs.
    *
    * Scale posture: candidates come from an equi-join on (band, bandKey) —
    * 2^bandBits buckets per band bound the collision fan-out; signature
    * computation is per-row; the verify join touches candidate pairs only.
    *
    * @return doc_i < doc_j with `hamming <= maxHamming` (LONG)
    */
  def nearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 60,
      bandBits: Int = 15,
      maxHamming: Int = 3): DataFrame = {
    val banded = bandedSignatures(docs, idCol, textCol, bits, bandBits, maxHamming)
    // Signatures ride through the band explode so the verify step needs no
    // join back to the (expensive) signature computation; the self-join's
    // two sides are identical subplans shuffled on the same key, so Spark's
    // ReuseExchange computes the signatures once.
    banded.toDF("doc_i", "sig_i", "band", "bkey")
      .join(banded.toDF("doc_j", "sig_j", "band", "bkey"), Seq("band", "bkey"))
      .filter(col("doc_i") < col("doc_j"))
      .withColumn("hamming", bit_count(col("sig_i").bitwiseXOR(col("sig_j"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_i", "doc_j", "hamming")
      .distinct() // a pair colliding in k bands appears k times
  }

  /** Cross-relation variant of [[nearDupPairs]] — the INCREMENTAL dedup
    * primitive: find every `left` document within `maxHamming` of some
    * `right` document, without pairing either relation against itself.
    * Same recall-1 pigeonhole contract (`maxHamming <= bands - 1`), so the
    * output equals a brute-force left×right scan.
    *
    * Scale posture: identical to the self-join case — banded equi-join on
    * (band, bandKey), verify on candidates only. The new-batch side is
    * typically orders of magnitude smaller than the corpus side; Catalyst
    * broadcasts its banded rows when small enough, otherwise both sides
    * shuffle on the same (band, bkey) key.
    *
    * @return (doc_a from `left`, doc_b from `right`, hamming LONG); ids are
    *         NOT compared across relations — a shared id value pairs like
    *         any other rows
    */
  def crossNearDupPairs(
      left: DataFrame, leftId: String, leftText: String,
      right: DataFrame, rightId: String, rightText: String,
      bits: Int = 60,
      bandBits: Int = 15,
      maxHamming: Int = 3): DataFrame = {
    val bl = bandedSignatures(left, leftId, leftText, bits, bandBits, maxHamming)
    val br = bandedSignatures(right, rightId, rightText, bits, bandBits, maxHamming)
    bl.toDF("doc_a", "sig_a", "band", "bkey")
      .join(br.toDF("doc_b", "sig_b", "band", "bkey"), Seq("band", "bkey"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .distinct() // a pair colliding in k bands appears k times
  }

  /** Per-document `bits`-bit signatures straight from a text column (wide
    * token hashes, compiled one-pass fold; null/empty text excluded) —
    * the building block for candidate generators OTHER than this module's
    * banding, e.g. a sorted-neighborhood blocker verifying its candidate
    * pairs by Hamming distance. Output: (doc_id, sig).
    */
  def textSignatures(
      docs: DataFrame, idCol: String, textCol: String, bits: Int): DataFrame =
    textSignaturesWith(docs, idCol, textCol, bits, Nil)

  /** [[textSignatures]] with extra pass-through columns — single code path
    * for batch and streaming banding (see [[bandedSignaturesWith]]).
    */
  private[graft] def textSignaturesWith(
      docs: DataFrame, idCol: String, textCol: String, bits: Int,
      carry: Seq[String], anchor: Option[Column] = None): DataFrame = {
    require(bits <= 60, "wideHash carries 60 informative bits")
    val th = org.apache.spark.sql.graft.bridge.column(
      graft.functions.TokenHashes(
        org.apache.spark.sql.graft.bridge.expression(col(textCol)), wide = true))
    // `anchor` (the streaming twin's event-time column) makes the
    // degenerate-doc filter watermark-safe: a plain conjunction is SPLIT by
    // PushPredicateThroughNonJoin and the text conjuncts sink below the
    // EventTimeWatermark node, so null-text sentinel rows would be dropped
    // before ever reaching it and could not advance the watermark (r13
    // ADVICE). Disjoining each conjunct with `anchor IS NULL` (plus one
    // `anchor IS NOT NULL` conjunct restoring the net semantics) keeps
    // every conjunct referencing the watermark attribute — none is pushed,
    // the whole filter stays above the watermark, and sentinels flow
    // through it before being dropped. Batch callers (anchor = None) keep
    // the plain, fully-pushable predicate.
    val keep = anchor match {
      case Some(a) =>
        (col(textCol).isNotNull || a.isNull) &&
          (length(trim(col(textCol))) > 0 || a.isNull) && a.isNotNull
      case None => col(textCol).isNotNull && length(trim(col(textCol))) > 0
    }
    docs.filter(keep)
      .select(Seq(col(idCol).as("doc_id"),
        coalesce(
          org.apache.spark.sql.graft.bridge.column(
            graft.functions.SimHashSig(
              org.apache.spark.sql.graft.bridge.expression(th), bits)),
          lit(0L)).as("sig")) ++ carry.map(col): _*)
  }

  /** Shared banding core of [[nearDupPairs]] / [[crossNearDupPairs]]:
    * 60-bit signatures exploded into one row per (band, bandKey).
    *
    * wideHash, not polyHash: every signature bit must be informative or the
    * dead bands would bucket all docs together (see TextOps.wideHash).
    * Degenerate docs (null or whitespace-only text) are excluded BEFORE
    * banding: they would all carry the all-zero signature and collide
    * pairwise in every band — a quadratic bucket over contentless rows
    * (exact dedup is the right tool there). The oracle applies the same
    * WHERE clause, keeping the brute-force-equality contract.
    */
  private def bandedSignatures(
      docs: DataFrame, idCol: String, textCol: String,
      bits: Int, bandBits: Int, maxHamming: Int): DataFrame =
    bandedSignaturesWith(docs, idCol, textCol, bits, bandBits, maxHamming, Nil)

  /** [[bandedSignatures]] with extra pass-through columns (`carry`) riding
    * beside (doc_id, sig, band, bkey) — the streaming twin
    * ([[graft.streaming.EventStreams.simhashNearDup]]) needs the event-time
    * column to survive banding so its watermark stays attached. Pure
    * projection for the carried columns: the signature computation, the
    * degenerate-doc filter, and the band explode are byte-identical to the
    * batch path (single code path, no semantic twin to drift).
    */
  private[graft] def bandedSignaturesWith(
      docs: DataFrame, idCol: String, textCol: String,
      bits: Int, bandBits: Int, maxHamming: Int, carry: Seq[String],
      anchor: Option[Column] = None): DataFrame = {
    require(bits % bandBits == 0, "bits must be a multiple of bandBits")
    require(bits <= 60, "wideHash carries 60 informative bits")
    val bands = bits / bandBits
    require(maxHamming <= bands - 1,
      s"recall-1 guarantee needs maxHamming <= bands-1 = ${bands - 1}")
    val sigs = textSignaturesWith(docs, idCol, textCol, bits, carry, anchor)
    sigs.select(Seq(col("doc_id"), col("sig")) ++ carry.map(col) :+
      posexplode(array((0 until bands).map(b => bandKey(col("sig"), b, bandBits)): _*))
        .as(Seq("band", "bkey")): _*)
  }
}
