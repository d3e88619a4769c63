package graft.operators

import org.apache.spark.sql.Column
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
    * repeated tokens vote once per occurrence.
    */
  def tokenHashes(text: Column): Column =
    transform(TextOps.tokens(text), TextOps.polyHash(_))

  /** SimHash of a precomputed token-hash array column. `bits` ≤ 62. */
  def simhashOf(th: Column, bits: Int = 32): Column =
    (0 until bits).map { b =>
      val vote = aggregate(th, lit(0L),
        (acc, h) => acc + when(shiftright(h, b) % 2 === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  def simhash(text: Column, bits: Int = 32): Column = simhashOf(tokenHashes(text), bits)

  /** Band key for bucketed near-dup candidate generation: byte `band` of the
    * signature (8-bit bands). Two docs agreeing on any band byte become a
    * candidate pair — equi-joinable, no all-pairs scan.
    */
  def bandKey(sim: Column, band: Int): Column =
    shiftright(sim, band * 8) % 256
}
