package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FunnelOps

/** [[graft.operators.FunnelOps]] — earliest ordered-step completion. */
class FunnelOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Brute force: scan the user's events in order, advancing a step
    * cursor; record the ts at which each prefix first completes.
    */
  private def brute(evs: Seq[(Long, Long, String)], steps: Seq[String])
      : Map[Long, (Seq[Option[Long]], Int)] =
    evs.groupBy(_._1).map { case (u, rows) =>
      val times = Array.fill[Option[Long]](steps.size)(None)
      rows.sortBy(r => (r._2, r._3)).foreach { case (_, ts, tp) =>
        val i = steps.indexOf(tp)
        if (i == 0 && times(0).isEmpty) times(0) = Some(ts)
        // strictly-before semantics: prior step must have completed on an
        // EARLIER row; equal-ts rows resolve by the tie order (here: type
        // string), matching the operator's total order
        else if (i > 0 && times(i).isEmpty && times(i - 1).exists(_ < ts))
          times(i) = Some(ts)
        else if (i > 0 && times(i).isEmpty && times(i - 1).contains(ts)) {
          // same ts: completed only if the earlier row came first in the
          // tie order — with type-string ties, ordering 'click' < 'view'
          // etc. decides; brute mirrors by comparing strings
          val prevType = steps(i - 1)
          if (prevType < tp) times(i) = Some(ts)
        }
      }
      u -> (times.toSeq, times.takeWhile(_.isDefined).size)
    }

  test("funnel ≡ cursor scan on random event streams") {
    val rng = new scala.util.Random(41)
    val types = Seq("view", "click", "buy", "noise")
    val evs = Seq.tabulate(2000) { _ =>
      (rng.nextInt(40).toLong, rng.nextInt(50).toLong,
        types(rng.nextInt(types.size)))
    }.distinct // distinct → (ts, type) is a total order per user
    val steps = Seq("view", "click", "buy")
    val got = FunnelOps.funnel(
        evs.toDF("u", "ts", "tp").repartition(7),
        "u", $"ts", Seq($"tp"),
        steps.map(s => s -> ($"tp" === s)))
      .select($"u", $"t_view", $"t_click", $"t_buy", $"steps_completed")
      .collect()
      .map(r => r.getLong(0) -> ((1 to 3).map(i =>
        if (r.isNullAt(i)) None else Some(r.getLong(i))), r.getInt(4)))
      .toMap
    val exp = brute(evs, steps)
    assert(got.keySet === exp.keySet)
    for (u <- exp.keys) assert(got(u) === exp(u), s"user $u")
  }

  test("a step can never complete on the same row as its predecessor") {
    // one event matching both step predicates: step 2 needs a STRICTLY
    // earlier completion, so it must stay null
    val df = Seq((1L, 10L, "both")).toDF("u", "ts", "tp")
    val r = FunnelOps.funnel(df, "u", $"ts", Seq($"tp"),
        Seq("a" -> lit(true), "b" -> lit(true)))
      .collect().head
    assert(r.getLong(1) === 10L) // t_a
    assert(r.isNullAt(2))        // t_b
    assert(r.getInt(3) === 1)
  }

  test("k chained steps plan ONE exchange (all windows share the sort)") {
    val df = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"))
      .toDF("u", "ts", "tp")
    val out = FunnelOps.funnel(df, "u", $"ts", Seq($"tp"),
      Seq("a", "b", "c", "d").map(s => s -> ($"tp" === s)))
    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val ex = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(ex === 1, s"funnel must shuffle once regardless of k:\n$p")
  }
}
