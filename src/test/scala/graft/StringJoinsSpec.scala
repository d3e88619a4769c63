package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.StringJoins

class StringJoinsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    (for {
      (i, si) <- rows; (j, sj) <- rows
      if i < j && si != null && sj != null
      dist = levenshteinRef(si, sj)
      if dist <= d
    } yield (i, j, dist.toLong)).toSet

  // Straightforward DP reference — the test's own oracle.
  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  private def run(rows: Seq[(Long, String)], d: Int, q: Int = 3): Set[(Long, Long, Long)] =
    StringJoins.editDistanceJoin(rows.toDF("id", "s"), "id", "s", d, q)
      .as[(Long, Long, Long)].collect().toSet

  test("equals brute force on part names with planted typos") {
    val names = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_partkey", $"p_name").as[(Long, String)].collect().toSeq
    val planted = names.take(40).map { case (id, s) => (id + 100000L, s + "x") }
    val rows = names ++ planted
    val got = run(rows, d = 2)
    assert(got === brute(rows, 2))
    assert(got.size >= 40) // every planted typo pairs with its original
  }

  test("short-string path: strings below q*(d+1) match despite sharing no grams") {
    // ed("ab","ba")=2 with q=3: zero shared 3-grams — only the bucketed
    // short path can find it.
    val rows = Seq((1L, "ab"), (2L, "ba"), (3L, "abcdef"), (4L, "abcdxf"),
      (5L, ""), (6L, "a"), (7L, "zzzzzzzzzzzz"))
    val got = run(rows, d = 2)
    assert(got === brute(rows, 2))
    assert(got.contains((1L, 2L, 2L)) && got.contains((5L, 6L, 1L)))
  }

  test("mixed-length pairs across the long/short boundary are found once") {
    // len 8 (< q*(d+1) = 9) vs len 10 (>= 9): the pair must come from the
    // short path exactly once, not be dropped between paths.
    val rows = Seq((1L, "abcdefgh"), (2L, "abcdefghij"), (3L, "abcdefghijkl"))
    val df = StringJoins.editDistanceJoin(rows.toDF("id", "s"), "id", "s", 2)
    assert(df.count() === df.distinct().count()) // no double emission
    assert(run(rows, d = 2) === brute(rows, 2))
  }

  test("random fuzz equals brute force across the length spectrum") {
    val rnd = new scala.util.Random(42)
    def word(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val rows = (0 until 120).map { i =>
      (i.toLong, word(rnd.nextInt(14))) // lengths 0..13 straddle q*(d+1)=9
    }
    for (d <- Seq(0, 1, 2)) assert(run(rows, d) === brute(rows, d), s"d=$d")
  }

  test("null strings never match; duplicates match at distance zero") {
    val rows = Seq((1L, "same"), (2L, "same"), (3L, null: String))
    assert(run(rows, d = 1) === Set((1L, 2L, 0L)))
  }
}
