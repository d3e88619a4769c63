package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CorpusOps, TextOps}

class CorpusOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("wordNgramsAll keeps duplicates in order; short docs yield empty") {
    val got = Seq("a b a b a", "a b", "a", "").toDF("text")
      .select(CorpusOps.wordNgramsAll($"text", 2)).as[Seq[String]].collect()
    assert(got(0) === Seq("a b", "b a", "a b", "b a"))
    assert(got(1) === Seq("a b"))
    assert(got(2) === Seq.empty)
    // "" splits to [""], one token < 2 — still empty
    assert(got(3) === Seq.empty)
  }

  test("repetitionStats: counts and the integer keep rule match a hand-computed doc") {
    // bigrams of "a b a b a b c": a b ×3, b a ×2, b c ×1 → 6 total, top 3.
    // 3·5 ≤ 6·1 is false → drop. "x y z w" has all-distinct bigrams (3 of
    // them, top 1): 1·5 ≤ 3 false → ALSO drop (short docs can't pass 1/5
    // with n_grams < 5 — the rule composes with a length filter upstream).
    val d = Seq((1L, "a b a b a b c"), (2L, "x y z w"),
      (3L, "t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val got = CorpusOps.repetitionStats(d, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 6L, 3L, 0L), (2L, 3L, 1L, 0L), (3L, 8L, 1L, 1L)))
  }

  test("repetitionStats equals a brute-force count over the fixture") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet").limit(100)
    val got = CorpusOps.repetitionStats(d, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val brute = d.select($"doc_id", $"text").as[(Long, String)].collect().map {
      case (id, text) =>
        val toks = text.split(" ")
        val grams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).map(_._2.size)
        id -> (id, grams.size.toLong, counts.max.toLong,
          if (counts.max * 5 <= grams.size) 1L else 0L)
    }.toMap
    assert(got === brute)
  }

  test("topTerms ranks by tf desc, df asc (rarer wins), token asc") {
    val d = Seq(
      (1L, "x x x common rare1"), // x tf=3; common/rare1 tf=1 — df breaks the tie
      (2L, "common common y"),
      (3L, "common z")).toDF("doc_id", "text")
    val got = CorpusOps.topTerms(d, "doc_id", "text", k = 2)
      .select("doc_id", "rnk", "token").as[(Long, Int, String)].collect().toSet
    // doc 1: x (tf 3) then rare1 (tf 1, df 1) beats common (tf 1, df 3)
    assert(got === Set(
      (1L, 1, "x"), (1L, 2, "rare1"),
      (2L, 1, "common"), (2L, 2, "y"),
      (3L, 1, "z"), (3L, 2, "common"))) // z: df 1 < common's df 3 at equal tf
  }

  test("stratifiedHashSample: deterministic, exact hash rule, unconfigured strata dropped") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val rates = Seq(("en", 1, 2), ("de", 1, 4))
    val got = CorpusOps.stratifiedHashSample(d, $"lang", $"text", rates, hashBase = 131L)
      .select("doc_id").as[Long].collect().toSet
    val hashes = d.select($"doc_id", $"lang",
        TextOps.polyHash($"text", 131L).as("h"))
      .as[(Long, String, Long)].collect()
    val expected = hashes.collect {
      case (id, "en", h) if h % 2 < 1 => id
      case (id, "de", h) if h % 4 < 1 => id
    }.toSet
    assert(got === expected)
    assert(expected.nonEmpty)
    // repeat run identical (no rand())
    assert(CorpusOps.stratifiedHashSample(d, $"lang", $"text", rates, 131L)
      .select("doc_id").as[Long].collect().toSet === got)
    // base-31 decision differs from base-131 (independent decisions)
    val other = CorpusOps.stratifiedHashSample(d, $"lang", $"text", rates, 31L)
      .select("doc_id").as[Long].collect().toSet
    assert(other != got)
  }
}
