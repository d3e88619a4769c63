package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CharShingles, CharShinglesImpl}
import graft.operators.TextOps
import org.apache.spark.unsafe.types.UTF8String

/** Equivalence proof for the codegen'd character-shingle extraction: the
  * compiled expression ([[CharShingles]]) must be element-for-element
  * identical (values AND order — array_distinct keeps first occurrence) to
  * the interpreted `array_distinct(transform(sequence…substr))` HOF it
  * replaced, on every string with `length >= n`. Below `n` the HOF is
  * garbage by construction (`sequence` counts down, `substr` goes
  * end-relative), so there the compiled contract — empty array — is pinned
  * directly. Both interpreted eval and whole-stage codegen paths are
  * exercised.
  */
class CharShinglesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "abc",                          // exactly one shingle
    "abcd",                         // two, no dups
    "aaaaaa",                       // maximal dedup: one distinct shingle
    "abcabcabc",                    // periodic: dups in every band
    "the quick brown fox jumps",    // spaces are characters too
    "ab ab ab",                     // short period with spaces
    "héllo wörld héllo",            // multi-byte UTF-8 codepoints
    "日本語のテキスト日本語",        // 3-byte codepoints throughout
    "a😀b😀a😀b",                    // supplementary (4-byte) codepoints
    "xyz"                           // n == length boundary
  )

  test("matches the HOF formulation on length >= n (values and order)") {
    for (n <- Seq(2, 3, 5)) {
      val df = texts.toDF("t").filter(length($"t") >= n)
      val both = df.select(
        TextOps.charShingles($"t", n).as("compiled"),
        TextOps.charShinglesHof($"t", n).as("hof"))
      val rows = both.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n")
      }
    }
  }

  test("interpreted eval agrees with codegen") {
    // Force the interpreted path by eval'ing the expression directly.
    for (t <- texts; n <- Seq(2, 3)) {
      val interp = CharShinglesImpl.shingles(UTF8String.fromString(t), n)
        .toArray[UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val viaPlan = Seq(t).toDF("t")
        .select(TextOps.charShingles($"t", n)).as[Seq[String]].head()
      assert(interp == viaPlan, s"t='$t' n=$n")
    }
  }

  test("strings shorter than n yield the empty array; null yields null") {
    val df = Seq(Some("ab"), Some(""), None).toDF("t")
      .select(TextOps.charShingles($"t", 3).as("g"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0) == Seq.empty)
    assert(rows(1).getSeq[String](0) == Seq.empty)
    assert(rows(2).isNullAt(0))
  }

  test("shingles count codepoints, not bytes or UTF-16 units") {
    // "a😀b" is 3 codepoints (4 UTF-16 units, 6 bytes): exactly one trigram.
    val g = Seq("a😀b").toDF("t")
      .select(TextOps.charShingles($"t", 3)).as[Seq[String]].head()
    assert(g == Seq("a😀b"))
  }

  test("stays inside whole-stage codegen") {
    // A literal relation constant-folds to LocalTableScan, so assert over a
    // real scan: the projection containing the expression must sit in a
    // WholeStageCodegen stage.
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(TextOps.charShingles(col("text"), 3).as("g"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"projection fell out of codegen:\n$plan")
    assert(plan.contains("graft_char_shingles"), plan)
  }

  test("rejects non-string input at analysis time") {
    val err = intercept[Exception] {
      Seq(1, 2).toDF("i").select(TextOps.charShingles($"i", 3)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }
}
