package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CorpusOps, TextOps, TextStats}

/** Equivalence pins for the r21 de-GC rewrites (r20 VERDICT item 2): every
  * hot token pipeline that switched from per-token heap STRINGS to the
  * compiled 60-bit long hash — or from `size(split(...))` to arithmetic —
  * must produce bit-identical results to its old string-keyed formulation.
  * The DuckDB oracle gates pin the full queries at both SFs; these tests
  * pin the adversarial micro-cases (ties at the top-k boundary, empty
  * tokens, multi-space runs, NULL text) where the rewrites could diverge
  * without the fixture noticing.
  */
class DeGcEquivalenceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("nTokens arithmetic form ≡ size(split) on edge strings") {
    val df = Seq(Some(""), Some(" "), Some("a"), Some("a b"), Some(" a  b "),
      Some("  "), Option.empty[String]).toDF("text")
    val got = df.select(TextStats.nTokens($"text").as("a"),
      size(TextOps.tokens($"text")).cast("long").as("b")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1), r.toString)
    }
  }

  test("predictedLang let-bound form ≡ naive CASE chain (ties, null text)") {
    // The old formulation, verbatim (18 inlined split sites) — the oracle's
    // SQL mirrors this chain, so the new let-bound form must match it.
    def naive(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val scores = TextStats.LangProfiles.map { case (lang, m) =>
        lang -> TextStats.langScore(text, m) }
      val branches = scores.map { case (lang, s) =>
        val others = scores.collect { case (l2, o) if l2 != lang => o }
        (others.map(o => s >= o).reduce(_ && _), lang)
      }
      branches.init.foldRight(lit(branches.last._2): org.apache.spark.sql.Column) {
        case ((cond, lang), rest) => when(cond, lang).otherwise(rest)
      }
    }
    val df = Seq(
      Some("the a customer"),            // clear en
      Some("key value hash"),            // clear de
      Some("the key"),                   // tie de/en → de (code order)
      Some("spark data the key"),        // 4-way tie → de
      Some(""), Some("zzz unknown"),     // no markers → 4-way zero tie → de
      Option.empty[String]               // null text → chain falls to zh
    ).toDF("text")
    val got = df.select(TextStats.predictedLang($"text").as("n"),
      naive($"text").as("o")).collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1), r.toString))
  }

  test("topTokens hash-keyed selection ≡ string-keyed top-V (boundary ties)") {
    // Token counts aa=4, bb=4, cc=3, dd=2, ee=2 and V=4: the v-th largest
    // count (2) is shared by two tokens — the tie-complete cut must keep
    // both as candidates and resolve by token ASC exactly like the old
    // TakeOrdered over strings.
    val docs = Seq("bb aa cc", "aa bb dd", "cc aa bb", "dd ee cc bb aa ee")
      .toDF("text")
    val naive = docs.select(explode(TextOps.tokens($"text")).as("token"))
      .filter(length($"token") > 0)
      .groupBy($"token").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token".asc).limit(4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = CorpusOps.topTokens(docs, "text", 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === naive)
    assert(got.map(_._1) === got.map(_._1).distinct)
  }

  test("tokenShift tie-complete threshold cut keeps string tie-break order") {
    // Constructed so several tokens share the SAME shift numerator at the
    // k boundary: equal counts on both sides for x/y/z, and k cuts inside
    // the tied group — selection must be by token ASC among the tied.
    val a = Seq("x y z q q").toDF("text")
    val b = Seq("x y z").toDF("text")
    // counts: a: x1 y1 z1 q2 (na=5), b: x1 y1 z1 (nb=3)
    // num(x)=num(y)=num(z)=|1·3−1·5|=2, num(q)=|2·3−0·5|=6
    val got = CorpusOps.tokenShift(a, b, "text", k = 2)
      .select($"rnk", $"token").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got === Seq((1, "q"), (2, "x")))
  }

  test("TokenClassCounts single pass ≡ regexp_extract_all class counts") {
    val df = Seq("", " ", "abc", "a1b2", "12 34", "a!b?c", "héllo wörld",
      "  x  9  !  ", "a" * 50 + "9" * 3 + "!", "ab12cd ef!34 世a",
      "v0!", "mixed 12abc34 end.").toDF("text")
    val pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    val cls = org.apache.spark.sql.graft.bridge.column(
      graft.functions.TokenClassCounts(
        org.apache.spark.sql.graft.bridge.expression($"text")))
    val toks = regexp_extract_all($"text", lit(pat), lit(0))
    val got = df.select(
      cls.getField("n_word").as("w"), cls.getField("n_digit").as("d"),
      cls.getField("n_punct").as("p"),
      size(filter(toks, x => x.rlike("^[a-z]+$"))).as("rw"),
      size(filter(toks, x => x.rlike("^[0-9]+$"))).as("rd"),
      size(toks).as("rt"), $"text").collect()
    got.foreach { r =>
      assert(r.getInt(0) === r.getInt(3), s"words: $r")
      assert(r.getInt(1) === r.getInt(4), s"digits: $r")
      assert(r.getInt(2) === r.getInt(5) - r.getInt(3) - r.getInt(4),
        s"punct: $r")
    }
  }

  test("tokenizeToIds hash join ≡ string join (OOV, empty tokens, order)") {
    val docs = Seq((1L, "aa bb  cc"), (2L, "cc zz aa"), (3L, "")).toDF("doc_id", "text")
    val vocab = Seq(("aa", 0L), ("bb", 1L), ("cc", 2L)).toDF("token", "token_id")
    val got = CorpusOps.tokenizeToIds(docs, "doc_id", "text", vocab)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq
    // "aa bb  cc" splits to [aa, bb, "", cc] — the empty token is OOV.
    assert(got === Seq(
      (1L, 4L, Seq(0L, 1L, -1L, 2L)),
      (2L, 3L, Seq(2L, -1L, 0L)),
      (3L, 1L, Seq(-1L))))
  }
}
