package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WindowHashesImpl
import graft.operators.TextOps
import org.apache.spark.unsafe.types.UTF8String

/** Equivalence proof for the fused window wide-hash: the compiled
  * Rabin–Karp expression ([[graft.functions.WindowHashes]]) must be
  * element-for-element identical (values AND order) to the interpreted
  * `transform(charShingles(t, n), wideHash)` twin it replaced — the rolling
  * recurrence and the per-window left fold must agree exactly, mod 1e9+7,
  * on every codepoint class. (The one permitted divergence — dedup by
  * 60-bit hash instead of by string — requires an in-document 60-bit
  * collision, absent from any fixture and ≈2^-61·len² improbable.)
  */
class WindowHashesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "abc",
    "abcd",
    "aaaaaa",                       // maximal dedup: one distinct window
    "abcabcabc",                    // periodic: rolling must re-derive equal hashes
    "the quick brown fox jumps",
    "héllo wörld héllo",            // multi-byte UTF-8 codepoints
    "日本語のテキスト日本語",        // 3-byte codepoints: big c_out·pow products
    "a😀b😀a😀b",                    // supplementary (4-byte) codepoints
    "xyz"
  )

  test("matches transform(charShingles, wideHash) on length >= n (values and order)") {
    for (n <- Seq(2, 3, 24)) {
      val df = (texts.toDF("t") union
          spark.read.parquet(s"$sf0001/documents.parquet")
            .select($"text".as("t")).limit(200))
        .filter(length($"t") >= n)
      val rows = df.select(
        TextOps.windowHashes($"t", n).as("compiled"),
        transform(TextOps.charShingles($"t", n), w => TextOps.wideHash(w)).as("hof"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"n=$n")
      }
    }
  }

  test("random unicode strings: rolling recurrence ≡ per-window left fold") {
    // The rolling update ((h − c_out·pow)·base + c_in mod p) is the riskiest
    // arithmetic in the expression — drive it over seeded random strings
    // mixing ASCII, 2-byte, 3-byte, and supplementary codepoints.
    val rnd = new scala.util.Random(41)
    val alphabet = ("ab XY9.-" + "éßñ" + "日本語中" + "😀🚀").toCharArray
      .mkString.codePoints().toArray
    val strs = Seq.fill(60) {
      val len = rnd.nextInt(40)
      new String((0 until len).flatMap(_ =>
        Character.toChars(alphabet(rnd.nextInt(alphabet.length)))).toArray)
    }
    for (n <- Seq(2, 3, 7)) {
      val rows = strs.toDF("t").filter(length($"t") >= n)
        .select(
          TextOps.windowHashes($"t", n).as("compiled"),
          transform(TextOps.charShingles($"t", n), w => TextOps.wideHash(w)).as("hof"))
        .collect()
      rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"n=$n"))
    }
  }

  test("interpreted eval agrees with the plan path") {
    for (t <- texts; n <- Seq(2, 3)) {
      val interp = WindowHashesImpl.hashes(UTF8String.fromString(t), n)
        .toLongArray().toSeq
      val viaPlan = Seq(t).toDF("t")
        .select(TextOps.windowHashes($"t", n)).as[Seq[Long]].head()
      assert(interp == viaPlan, s"t='$t' n=$n")
    }
  }

  test("strings shorter than n yield the empty array; null yields null") {
    val rows = Seq(Some("ab"), Some(""), None).toDF("t")
      .select(TextOps.windowHashes($"t", 3).as("g")).collect()
    assert(rows(0).getSeq[Long](0) == Seq.empty)
    assert(rows(1).getSeq[Long](0) == Seq.empty)
    assert(rows(2).isNullAt(0))
  }

  test("windows count codepoints, not bytes or UTF-16 units") {
    // "a😀b" is 3 codepoints: exactly one trigram window, whose hash must
    // fold the supplementary codepoint (0x1F600), not its surrogate halves.
    val got = Seq("a😀b").toDF("t")
      .select(TextOps.windowHashes($"t", 3)).as[Seq[Long]].head()
    val p = 1000000007L
    def fold(base: Long) =
      Seq('a'.toLong, 0x1F600L, 'b'.toLong).foldLeft(0L)((h, c) => (h * base + c) % p)
    assert(got == Seq(fold(31) + (fold(131) << 30)))
  }

  test("stays inside whole-stage codegen") {
    val plan = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(TextOps.windowHashes(col("text"), 24).as("g"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"projection fell out of codegen:\n$plan")
    assert(plan.contains("graft_window_hashes"), plan)
  }

  test("rejects non-string input at analysis time; n < 2 at build time") {
    val err = intercept[Exception] {
      Seq(1, 2).toDF("i").select(TextOps.windowHashes($"i", 3)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
    assertThrows[IllegalArgumentException](
      graft.functions.WindowHashes(
        org.apache.spark.sql.graft.bridge.expression(lit("abc")), 1))
  }
}
