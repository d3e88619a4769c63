package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Equivalence proof for the codegen'd per-token hashing: bit-identical to
  * `transform(split(text, " "), t -> polyHash(t))` (and the wideHash
  * variant) on every input — split semantics corners (empty string hashes
  * as one empty token, consecutive spaces keep empty tokens), multibyte
  * text, astral code points.
  */
class TokenHashesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def compiled(wide: Boolean) =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.TokenHashes(
        org.apache.spark.sql.graft.bridge.expression($"text"), wide))

  private val texts = Seq(
    "the quick brown fox", "a", "", "  ", "a  b",
    " leading and trailing ",
    "héllo wörld naïve", "日本語 の テキスト", "emoji 😀 mix 🎉")

  test("narrow form ≡ transform(split, polyHash) on all fixtures") {
    val r = texts.toDF("text").select(
      compiled(wide = false).as("c"),
      transform(split($"text", " "), t => TextOps.polyHash(t)).as("h"), $"text").collect()
    r.foreach(row => assert(row.getSeq[Long](0) === row.getSeq[Long](1),
      s"diverged on '${row.getString(2)}'"))
  }

  test("wide form ≡ transform(split, wideHash) on all fixtures") {
    val r = texts.toDF("text").select(
      compiled(wide = true).as("c"),
      transform(split($"text", " "), t => TextOps.wideHash(t)).as("h"), $"text").collect()
    r.foreach(row => assert(row.getSeq[Long](0) === row.getSeq[Long](1),
      s"diverged on '${row.getString(2)}'"))
  }

  test("empty string is one empty token (hash 0), matching split semantics") {
    val r = Seq("").toDF("text").select(compiled(wide = false)).collect()(0).getSeq[Long](0)
    assert(r === Seq(0L))
  }

  test("stays inside whole-stage codegen over the fixture table") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(50)
    val out = docs.select(graft.operators.SimHash.tokenHashes($"text").as("th"))
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("graft_token_hashes"))
    assert(p.contains("*(1)"), s"token hashing fell out of codegen:\n$p")
  }
}
