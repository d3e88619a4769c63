package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sessionize

class SessionizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // (event_id, user, epoch seconds): u1 has two sessions split by a 100s gap
  // (> gap 60), u2 one session; boundary case: exactly gap = no split.
  private val ev = Seq(
    (1L, "u1", 1000L), (2L, "u1", 1030L), (3L, "u1", 1130L),
    (4L, "u1", 1190L), // 60s after 1130 — equal to gap, same session
    (5L, "u2", 5000L)).toDF("event_id", "user_id", "sec")

  test("gap-based boundaries: strict > gap splits, == gap does not") {
    val out = Sessionize.sessions(ev, "user_id", $"sec", gapSec = 60L,
      orderCols = Seq($"sec", $"event_id"))
      .select($"user_id", $"session_idx", $"start_epoch", $"end_epoch", $"n_events")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq === Seq(
      ("u1", 1L, 1000L, 1030L, 2L),
      ("u1", 2L, 1130L, 1190L, 2L),
      ("u2", 1L, 5000L, 5000L, 1L)))
  }

  test("session_idx is deterministic under repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Sessionize.withSessionIdx(df, "user_id", $"sec", 60L, Seq($"sec", $"event_id"))
        .select($"event_id", $"session_idx").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(ev) === run(ev.repartition(5)))
  }
}
