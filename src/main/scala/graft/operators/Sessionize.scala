package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-based event sessionization: a new session starts when the time since
  * the user's previous event exceeds `gapSec` (classic lag + cumulative-sum
  * formulation — two window passes over the same (user, time) ordering, so
  * Spark plans ONE shuffle keyed on the user column and both windows run on
  * the co-partitioned, co-sorted data).
  *
  * Time arrives as an epoch-seconds Column expression, not a hardcoded
  * timestamp type — callers read events via `graft.Tables.events`, which
  * normalizes `ts` to a nanosecond BIGINT whatever the fixture's physical
  * type, and integer arithmetic sidesteps any cross-engine rounding
  * (DuckDB's `CAST(epoch(ts) AS BIGINT)` ROUNDS; both sides must floor).
  *
  * Scale: partitions by user — per-user event counts are bounded in
  * practice, and a pathological hot user would be handled by AQE skew
  * handling, not by changing this operator's shape.
  */
object Sessionize {

  /** Adds `epoch_s` and `session_idx` (1-based per user) to `events`.
    * `orderCols` must make the per-user ordering total (e.g. raw ts + event
    * id) or the cumulative sum is nondeterministic under repartitioning.
    */
  def withSessionIdx(
      events: DataFrame,
      userCol: String,
      epochSec: Column,
      gapSec: Long,
      orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(orderCols: _*)
    val prev = lag(col("epoch_s"), 1).over(w)
    val isNew = when(prev.isNull || col("epoch_s") - prev > gapSec, 1L).otherwise(0L)
    events
      .withColumn("epoch_s", epochSec)
      .withColumn("session_idx",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Session-level rollup: one row per (user, session). `aggs` are applied
    * on top of the standard start/end/n_events columns.
    */
  def sessions(
      events: DataFrame,
      userCol: String,
      epochSec: Column,
      gapSec: Long,
      orderCols: Seq[Column],
      aggs: Seq[Column] = Nil): DataFrame = {
    val base = Seq(
      min(col("epoch_s")).as("start_epoch"),
      max(col("epoch_s")).as("end_epoch"),
      count(lit(1)).as("n_events"))
    withSessionIdx(events, userCol, epochSec, gapSec, orderCols)
      .groupBy(col(userCol), col("session_idx"))
      .agg(base.head, (base.tail ++ aggs): _*)
  }
}
