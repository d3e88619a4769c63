package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Equivalence proof for the codegen'd word shingling: element-for-element
  * identical (values AND order — array_distinct keeps first occurrence) to
  * the interpreted `split`/`transform`/`concat_ws` stack on every input,
  * including the split-semantics corners: consecutive spaces (empty
  * tokens), leading/trailing spaces, multibyte text, fewer tokens than n.
  */
class WordShinglesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c", "a b", "a", "",
    "repeat repeat repeat repeat",
    "a  double  spaces", // empty tokens ride through split(s, " ")
    " leading and trailing ",
    "héllo wörld naïve façade encore",
    "日本語 の テキスト です よ",
    "emoji 😀 mix 🎉 done here")

  private def both(n: Int) =
    texts.toDF("text").select(
      TextOps.wordShingles($"text", n).as("c"),
      TextOps.wordShinglesHof($"text", n).as("h"), $"text").collect()

  test("element-identical to the HOF stack for n = 1, 2, 3, 5") {
    for (n <- Seq(1, 2, 3, 5); r <- both(n)) {
      assert(r.getSeq[String](0) === r.getSeq[String](1),
        s"diverged at n=$n on '${r.getString(2)}'")
    }
  }

  test("shingles are the original byte ranges (spot checks)") {
    val r = Seq(("a  double  spaces", 0)).toDF("text", "i")
      .select(TextOps.wordShingles($"text", 2)).collect()(0).getSeq[String](0)
    // tokens: ["a", "", "double", "", "spaces"] -> 2-grams re-joined
    assert(r === Seq("a ", " double", "double ", " spaces"))
  }

  test("fewer than n tokens (and the empty string) yield the empty array") {
    val r = Seq("a b", "").toDF("text")
      .select(TextOps.wordShingles($"text", 3)).collect()
    assert(r.forall(_.getSeq[String](0).isEmpty))
  }

  test("minhash end-to-end result unchanged by the compiled shingling") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(300)
    val viaCodegen = graft.operators.MinHashLsh.nearDupPairs(docs, "doc_id", "text")
      .select($"doc_i", $"doc_j", $"n_common", $"n_union")
      .collect().map(_.toSeq).toSet
    assert(viaCodegen.nonEmpty, "fixture must contain near-duplicates")
    // brute-force oracle over the HOF shingles
    val sh = docs.filter(size(split($"text", " ")) >= 3)
      .select($"doc_id", TextOps.wordShinglesHof($"text", 3).as("sh"))
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_i"), col("b.doc_id").as("doc_j"),
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("long").as("n_common"),
        size(array_union(col("a.sh"), col("b.sh"))).cast("long").as("n_union"))
      .filter($"n_union" > 0 && $"n_common" * 2 >= $"n_union")
      .collect().map(_.toSeq).toSet
    assert(viaCodegen === brute)
  }
}
