package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps
import graft.functions.JaroWinklerImpl
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values (the pairs the DuckDB parity probe covered)") {
    // Bit-parity with duckdb 1.0 jaro_winkler_similarity was verified over
    // 255 fixture name pairs + these cases before this expression landed;
    // the q_jaro_winkler gate re-proves it continuously.
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("dwayne", "duane") === 0.8400000000000001)
    assert(jw("same", "same") === 1.0)
    assert(jw("", "x") === 0.0)
    // window ⌊max/2⌋−1 = 0 at length 2: transposed bigrams can't match
    assert(jw("ab", "ba") === 0.0 && jw("abc", "xyz") === 0.0)
  }

  test("symmetry and range on fixture names") {
    val names = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_name").as[String].collect().take(60)
    for (a <- names.take(15); b <- names.take(15)) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0 && s === jw(b, a))
      if (a == b) assert(s === 1.0)
    }
  }

  test("column wrapper evaluates in codegen and handles nulls") {
    val df = Seq(("martha", "marhta"), (null, "x")).toDF("a", "b")
    val got = df.select(TextOps.jaroWinkler($"a", $"b")).as[Option[Double]].collect()
    assert(got.toSeq === Seq(Some(0.9611111111111111), None))
  }
}
