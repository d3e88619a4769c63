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

  /** CDC apply — the change-data-capture superset of [[merge]]: each change
    * row carries an op (`'u'` upsert, `'d'` delete) and the LAST op per key
    * (by `ord` descending) decides the key's fate — upsert replaces or
    * inserts the row, delete removes the key. A delete of an absent key is
    * a no-op (its key simply produces no row), matching `MERGE … WHEN
    * MATCHED AND op = 'd' THEN DELETE` semantics. Any other op value fails
    * the job with a `raise_error` naming the offender — silent coercion of
    * a typo'd op into an upsert or delete would corrupt the target.
    *
    * Same plan shape as [[merge]]: one window and one anti-join, both
    * shuffled on the merge key, no driver materialization.
    */
  def applyChanges(
      target: DataFrame, changes: DataFrame, keys: Seq[String],
      ord: Seq[Column], opCol: String = "op"): DataFrame = {
    val last = lastWriteWins(changes, keys, ord)
    val checkedOp = when(col(opCol).isin("u", "d"), col(opCol))
      .otherwise(raise_error(concat(
        lit("applyChanges: unknown op '"), col(opCol), lit("' (expected 'u' or 'd')"))))
    val untouched = target.join(changes.select(keys.map(col): _*).distinct(), keys, "left_anti")
    last.filter(checkedOp === "u")
      .select(target.columns.map(col).toIndexedSeq: _*)
      .unionByName(untouched)
  }
}
