package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.StatOps

class ImputeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("nulls take the group's discrete median; non-nulls pass through unchanged") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.5)), ("a", Some(9.0)), ("a", None),
      ("b", Some(7.25)), ("b", None)).toDF("g", "v")
    val got = StatOps.imputeMedian(df, "g", "v")
      .select($"g", $"v", $"v_filled", $"was_imputed")
      .as[(String, Option[Double], Option[Double], Boolean)].collect().toSet
    assert(got === Set(
      ("a", Some(1.0), Some(1.0), false),
      ("a", Some(2.5), Some(2.5), false),
      ("a", Some(9.0), Some(9.0), false),
      ("a", None, Some(2.5), true),    // disc median = lower middle value
      ("b", Some(7.25), Some(7.25), false),
      ("b", None, Some(7.25), true)))
  }

  test("an all-null group stays null and is flagged un-imputed") {
    val df = Seq(("z", None: Option[Double]), ("z", None)).toDF("g", "v")
    val got = StatOps.imputeMedian(df, "g", "v")
      .select($"v_filled", $"was_imputed").as[(Option[Double], Boolean)].collect().toSeq
    assert(got === Seq((None, false), (None, false)))
  }

  test("row count and non-null values are preserved on the fixture") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .withColumn("v", when($"event_id" % 9 =!= 0, $"value"))
    val out = StatOps.imputeMedian(ev, "event_type", "v")
    assert(out.count() === ev.count())
    assert(out.filter($"was_imputed").count() ===
      ev.filter($"v".isNull).count())
    assert(out.filter(!$"was_imputed" && $"v".isNotNull)
      .filter($"v_filled" =!= $"v").count() === 0)
  }
}
