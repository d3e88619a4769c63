package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{SimHash, TextOps, TextStats}

class TextOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, s: String): Any =
    Seq(s).toDF("t").select(c.as("v")).head().get(0)

  test("polyHash matches the cross-engine reference values") {
    // Same values the DuckDB twin produces (left fold, *31, mod 1e9+7).
    assert(one(TextOps.polyHash($"t"), "hello") === 99162322L)
    assert(one(TextOps.polyHash($"t"), "a") === 97L)
    assert(one(TextOps.polyHash($"t"), "") === 0L)
  }

  test("codegen polyHash ≡ HOF reference on fixture text, edge cases, and both bases") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"text").as[String].take(200).toSeq ++
      Seq("", " ", "é ü ñ", "日本語 テスト", "a" * 5000, "")
    val df = docs.toDF("t")
    for (base <- Seq(31L, 131L)) {
      val diff = df.select(
          TextOps.polyHash($"t", base).as("fast"),
          TextOps.polyHashHof($"t", base).as("ref"))
        .filter(!($"fast" <=> $"ref")).count()
      assert(diff == 0L, s"codegen and HOF hashes diverge at base $base")
    }
    // null propagates as null through both
    val n = Seq[Option[String]](None).toDF("t")
      .select(TextOps.polyHash($"t").as("v")).head()
    assert(n.isNullAt(0))
  }

  test("wideHash fills 60 bits and equals its two-fold definition") {
    assert(one(TextOps.wideHash($"t"), "hello") ===
      99162322L + one(TextOps.polyHashHof($"t", 131L), "hello").asInstanceOf[Long] * (1L << 30))
  }

  test("wordShingles: counts, dedup, and short-document guard") {
    assert(one(TextOps.wordShingles($"t"), "a b c d e") ===
      Seq("a b c", "b c d", "c d e"))
    // Repeated trigram collapses (distinct).
    assert(one(size(TextOps.wordShingles($"t")), "x y x y x y") === 2)
    // Below shingle width → empty, not a descending-sequence artifact.
    assert(one(size(TextOps.wordShingles($"t")), "a b") === 0)
    assert(one(size(TextOps.wordShingles($"t")), "") === 0)
  }

  test("bagOfWordsKey normalizes order and multiplicity") {
    assert(one(TextOps.bagOfWordsKey($"t"), "b a b a") === "a b")
    assert(one(TextOps.bagOfWordsKey($"t"), "a b") === "a b")
  }

  test("simhash: identical inputs collide, near inputs are Hamming-close") {
    val base = "spark query batch table row key value hash scan merge"
    val near = "spark query batch table row key value hash scan filter"
    val far = "the a customer data window group sort line part big"
    val Seq(hBase, hNear, hFar) = Seq(base, near, far)
      .map(s => one(SimHash.simhash($"t"), s).asInstanceOf[Long])
    assert(hBase === one(SimHash.simhash($"t"), base))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(hBase, hNear) < ham(hBase, hFar))
  }

  test("text stats on a known sentence") {
    val s = "the a the big table"
    assert(one(TextStats.nTokens($"t"), s) === 5L)
    assert(one(TextStats.nUniqueTokens($"t"), s) === 4L)
    assert(one(TextStats.nStopwords($"t"), s) === 3L)
    assert(one(TextStats.nRegexTokens($"t"), s) === 5L)
    assert(one(TextStats.nTokensEst($"t"), s) === 5L) // ceil(19/4)
    assert(one(TextStats.nPunct($"t"), "ab, cd!") === 2L)
  }

  test("quality score formula over exact counts") {
    val s = "a b c d" // 4 tokens, 4 uniq, 1 stopword
    val q = one(TextStats.qualityScore($"t"), s).asInstanceOf[Double]
    assert(math.abs(q - (1.0 * 0.5 + (1 - 0.25) * 0.3 + (4.0 / 64) * 0.2)) < 1e-12)
  }

  test("predictedLang: argmax with lexicographic tiebreak") {
    // 'key' ∈ de-profile, 'the' ∈ en-profile; tie → 'de' (first in order).
    assert(one(TextStats.predictedLang($"t"), "key the") === "de")
    assert(one(TextStats.predictedLang($"t"), "the a spark") === "en")
    assert(one(TextStats.predictedLang($"t"), "spark query batch") === "zh")
  }

  test("blocklistHits: default normalization folds case and edge punctuation") {
    val terms = Seq("nsfw", "Spam")
    def hits(s: String, normalize: Boolean = true): Int =
      one(TextOps.blocklistHits($"t", terms, normalize), s)
        .asInstanceOf[Int]
    // Case folds on both sides: doc token "NSFW" matches term "nsfw",
    // doc token "spam" matches the mixed-case term "Spam".
    assert(hits("NSFW content and spam here") === 2)
    // Edge punctuation strips: "spam," / "(nsfw)" / "spam!?" all match.
    assert(hits("spam, and (nsfw) or spam!?") === 2)
    // INTERIOR punctuation is preserved: "sp.am" is not "spam".
    assert(hits("sp.am only") === 0)
    // Distinct-term count, not occurrence count.
    assert(hits("spam spam spam") === 1)
    // normalize = false keeps the raw exact-token semantics.
    assert(hits("NSFW spam.", normalize = false) === 0)
    assert(hits("nsfw spam.", normalize = false) === 1)
  }
}
