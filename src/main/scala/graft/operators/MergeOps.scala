package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-side upsert semantics — `INSERT … ON CONFLICT (k) DO UPDATE` as a
  * *relational* operator (SURVEY.md §7.3), so the capability is testable
  * against a SQL oracle without a live Postgres. The JDBC sink
  * ([[graft.sink.PostgresUpsertSink]]) is the physical strategy for the same
  * logical op against a real database.
  *
  * Scale notes: both the dedup window and the anti-join shuffle on the merge
  * key — the same hash partitioning, which AQE can reuse. No driver-side
  * materialization; a broadcast of `source` keys kicks in automatically when
  * the source is small (Catalyst decides via size stats).
  */
object MergeOps {

  /** Keep the last write per key: window dedup ordered by `ord` descending,
    * ties broken by preferring the larger `ord` tuple — callers should pass
    * an `ord` that is unique per key for deterministic results.
    */
  def lastWriteWins(source: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord.map(_.desc): _*)
    source
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** `merge(target, source, keys)` = dedup'd source ∪ (target rows whose key
    * is absent from source). Equivalent to upserting `source` into `target`.
    * Schemas must be union-compatible by name.
    */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame = {
    val winners = lastWriteWins(source, keys, ord)
    val untouched = target.join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")
    winners.select(target.columns.map(col).toIndexedSeq: _*).unionByName(untouched)
  }
}
