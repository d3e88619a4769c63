package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis (the MATCH_RECOGNIZE-lite every product
  * analytics stack ships): for each entity, find the EARLIEST completion
  * of step 1 < step 2 < … < step k in event order, where each step must
  * occur strictly after the row that completed the previous step.
  *
  * Construction: one chained running-min per step over the SAME
  * (entity, order) window —
  *
  *   done_1(row)  = ts            if step-1 predicate
  *   prior_i(row) = min(done_i)   over rows strictly before this one
  *   done_i(row)  = ts            if step-i predicate ∧ prior_{i-1} ≠ null
  *
  * so `done_i` marks rows that complete the i-prefix, and the per-entity
  * `min(done_i)` is the earliest completion time of that prefix. "Strictly
  * before" is by the total event order (`orderCols`), not by raw
  * timestamp, so simultaneous events resolve deterministically.
  *
  * Scale: every window shares one partitioning and one sort — ONE
  * entity-keyed shuffle and one in-partition sort regardless of k (the k
  * chained Window operators reuse the exchange; plan-guarded in the
  * spec). The final per-entity aggregate rides the same exchange. No
  * self-joins — the naive k-way "events JOIN events JOIN …" funnel
  * explodes on hot entities; this is O(total events · k) flat.
  */
object FunnelOps {

  /** Per-entity earliest step-completion times. Output: `idCol`,
    * `t_<name>` (the order-value at which the prefix through that step
    * first completes; NULL if never) per step, and `steps_completed`.
    *
    * @param orderTs   the (long) order/timestamp value reported in t_*
    * @param tieCols   extra columns after `orderTs` making the order total
    * @param steps     (name, rowPredicate) per step, in funnel order
    */
  def funnel(
      events: DataFrame,
      idCol: String,
      orderTs: Column,
      tieCols: Seq[Column],
      steps: Seq[(String, Column)]): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step required")
    require(steps.map(_._1).distinct.size == steps.size,
      "step names must be unique")
    val ordered = orderTs +: tieCols
    val before = Window.partitionBy(col(idCol))
      .orderBy(ordered: _*)
      .rowsBetween(Window.unboundedPreceding, -1)

    // Chain: each select layer adds done_i (needs prior_{i-1}, a window
    // result, hence the layering) — same window spec throughout.
    var df = events.withColumn("__graft_fts", orderTs)
    steps.zipWithIndex.foreach { case ((_, pred), i) =>
      val gate =
        if (i == 0) pred
        else pred && min(col(s"__graft_done_${i - 1}")).over(before).isNotNull
      df = df.withColumn(s"__graft_done_$i", when(gate, col("__graft_fts")))
    }
    val aggs = steps.zipWithIndex.map { case ((name, _), i) =>
      min(col(s"__graft_done_$i")).as(s"t_$name")
    }
    val completed = steps.indices
      .map(i => min(col(s"__graft_done_$i")).isNotNull.cast("int"))
      .reduce(_ + _)
    df.groupBy(col(idCol))
      .agg(aggs.head, (aggs.tail :+ completed.as("steps_completed")): _*)
  }
}
