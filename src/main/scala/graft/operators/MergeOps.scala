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

  /** Snapshot diff — the dataset-versioning primitive: classify every key of
    * two versions of a keyed table as `added` (only in `v2`), `removed`
    * (only in `v1`), `changed` (present in both, some non-key column
    * differs) or `unchanged`. Non-key columns compare NULL-SAFELY (`<=>`),
    * column by column — exact semantics, no hash-collision caveat.
    *
    * Scale posture: ONE full-outer equi-join on the key (both sides shuffle
    * on the same hash partitioning, AQE-reusable); presence is detected by
    * per-side literal markers, never by "all columns null" (which would
    * misclassify a genuinely all-null row). No driver materialization.
    *
    * @return one row per key present in either version: the key columns
    *         (coalesced) followed by `status` STRING
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    require(v1.columns.toSet == v2.columns.toSet,
      s"snapshot schemas differ: ${v1.columns.mkString(",")} vs ${v2.columns.mkString(",")}")
    val nonKey = v1.columns.filterNot(keys.contains).toSeq
    val a = v1.select(lit(1).as("graft_a") +: v1.columns.toSeq.map(c => col(c).as(s"a_$c")): _*)
    val b = v2.select(lit(1).as("graft_b") +: v2.columns.toSeq.map(c => col(c).as(s"b_$c")): _*)
    val cond = keys.map(k => col(s"a_$k") === col(s"b_$k")).reduce(_ && _)
    val same = nonKey.map(c => col(s"a_$c") <=> col(s"b_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    a.join(b, cond, "full_outer")
      .withColumn("status",
        when(col("graft_a").isNull, "added")
          .when(col("graft_b").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("changed"))
      .select(keys.map(k => coalesce(col(s"a_$k"), col(s"b_$k")).as(k)) :+ col("status"): _*)
  }
}
