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

  /** Incremental aggregate maintenance — refresh a stored per-group
    * aggregate under a CDC batch WITHOUT re-aggregating the base table: the
    * classic incremental-view-maintenance move (counting algorithm for
    * SUM/COUNT views). `baseAgg` is the stored result of
    * `base.groupBy(groupCols).agg(count(*) as cntCol, measures…)`; the
    * output equals recomputing that aggregate over
    * `applyChanges(base, changes, keys, ord)` — the executable contract
    * MergeOpsSpec pins.
    *
    * Mechanics: the last op per key decides each key's fate (shared
    * [[lastWriteWins]], with the same unknown-op `raise_error` as
    * [[applyChanges]]). Every base row whose key is touched contributes its
    * measures NEGATIVELY (it is replaced or deleted); every surviving
    * upsert row contributes POSITIVELY. The signed delta aggregates by
    * group — updates that MOVE a row between groups come out naturally as
    * (−old group, +new group) — and overlays the stored aggregate with one
    * full-outer join; groups whose refreshed count reaches zero are
    * dropped, groups born in the delta appear.
    *
    * Scale posture — the whole point at 100 TB: the stored aggregate is
    * O(|groups|) and the delta work is O(|changes| + |touched base rows|).
    * The only contact with the base is a LEFT SEMI join on the change keys
    * — broadcast when the batch is small (Catalyst decides), and
    * partition-pruned/shuffle-free when the base is stored bucketed on the
    * key ([[ScaleJoins.writeBucketed]]). Nothing re-shuffles the base's
    * full measure columns; a nightly full re-aggregation becomes a
    * per-batch O(|delta|) touch-up.
    *
    * Measures must be non-null-valued expressions (cast/`coalesce` nulls
    * upstream): a group whose stored sum is NULL cannot be distinguished
    * from 0 when overlaying signed deltas.
    *
    * @param baseAgg  stored aggregate: `groupCols ++ (cntCol, measure names)`
    * @param base     the keyed snapshot `baseAgg` was computed from
    * @param changes  CDC rows: key cols + payload + `opCol` + `ord` cols
    * @param measures (name, row-level expression) pairs — decimal-typed for
    *                 order-independent exactness ([[graft.Tables.dec]])
    */
  def refreshAggregate(
      baseAgg: DataFrame, base: DataFrame, changes: DataFrame,
      keys: Seq[String], groupCols: Seq[String],
      measures: Seq[(String, Column)], ord: Seq[Column],
      opCol: String = "op", cntCol: String = "cnt"): DataFrame = {
    require(groupCols.nonEmpty, "refreshAggregate needs at least one group column")
    val names = measures.map(_._1)
    require((cntCol +: names).forall(baseAgg.columns.contains),
      s"baseAgg must carry '$cntCol' and every measure: ${baseAgg.columns.mkString(",")}")
    val last = lastWriteWins(changes, keys, ord)
    val checkedOp = when(col(opCol).isin("u", "d"), col(opCol))
      .otherwise(raise_error(concat(
        lit("refreshAggregate: unknown op '"), col(opCol), lit("' (expected 'u' or 'd')"))))
    val touched = changes.select(keys.map(col): _*).distinct()
    def signed(df: DataFrame, sgn: Int): DataFrame =
      df.select(groupCols.map(col) ++ (lit(sgn.toLong).as("graft_sgn") +:
        measures.map { case (n, c) => (if (sgn > 0) c else -c).as(n) }): _*)
    val delta = signed(last.filter(checkedOp === "u"), 1)
      .unionByName(signed(base.join(touched, keys, "left_semi"), -1))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("graft_sgn")).as("graft_dcnt"),
        names.map(n => sum(col(n)).as(s"graft_d_$n")): _*)
    baseAgg.join(delta, groupCols, "full_outer")
      .withColumn(cntCol,
        coalesce(col(cntCol), lit(0L)) + coalesce(col("graft_dcnt"), lit(0L)))
      .filter(col(cntCol) > 0)
      .select(groupCols.map(col) ++ (col(cntCol) +: names.map(n =>
        (coalesce(col(n), lit(0)) + coalesce(col(s"graft_d_$n"), lit(0))).as(n))): _*)
  }

  /** Slowly-changing-dimension TYPE 2 build — turn a keyed change history
    * into versioned dimension rows with validity intervals: every surviving
    * upsert becomes a row `[valid_from, valid_to)` where `valid_to` is the
    * NEXT change's version (null = current); a delete (`op = 'd'`) closes
    * the preceding interval and emits no row, and a later upsert of the same
    * key opens a fresh one. `collapseUnchanged = true` additionally drops an
    * upsert whose attributes null-safely equal the immediately preceding
    * upsert's (the no-op update storms real CDC feeds are full of) — the
    * comparison never reaches across a delete, so re-inserting an identical
    * row after a delete still opens a new version.
    *
    * Column roles: `keys` identify the entity; `versionCol` is the change's
    * effective time and becomes `valid_from`; `tieCols` break `versionCol`
    * ties (pass enough for a UNIQUE total order per key — determinism is on
    * the caller, as in [[lastWriteWins]]); `carryCols` ride through to the
    * output but do NOT participate in the unchanged-comparison (version ids,
    * audit columns); every remaining column is a compared attribute. Unknown
    * op values fail the job via `raise_error`, as in [[applyChanges]].
    *
    * Scale posture: ONE hash exchange on `keys` serves both window passes —
    * the collapse lag-filter preserves the sort order the interval lead pass
    * requires, so EnsureRequirements inserts no second exchange or sort (the
    * PlanShapeSpec guard). Per-key work is linear in that key's history; a
    * pathologically hot entity serializes into one task, the same skew
    * profile as any per-key window.
    *
    * Output: `keys ++ carryCols ++ attrs ++ (valid_from, valid_to,
    * is_current)`.
    */
  def scdType2(
      changes: DataFrame,
      keys: Seq[String],
      versionCol: String,
      tieCols: Seq[Column] = Nil,
      carryCols: Seq[String] = Nil,
      opCol: String = "op",
      collapseUnchanged: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "scdType2 needs at least one key column")
    val attrs = changes.columns.toSeq.filterNot(c =>
      keys.contains(c) || carryCols.contains(c) || c == versionCol || c == opCol)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol) +: tieCols: _*)
    val checkedOp = when(col(opCol).isin("u", "d"), col(opCol))
      .otherwise(raise_error(concat(
        lit("scdType2: unknown op '"), col(opCol), lit("' (expected 'u' or 'd')"))))
    val validated = changes.withColumn(opCol, checkedOp)
    val survivors =
      if (!collapseUnchanged) validated
      else {
        // lag() sees the PRE-filter neighbor, which is exactly right: equal
        // attrs chain transitively, so comparing against a row that is
        // itself collapsed still gives the correct verdict.
        val prev = lag(struct(col(opCol) +: attrs.map(col): _*), 1).over(w)
        val sameAttrs = attrs.map(c => col("graft_prev").getField(c) <=> col(c))
          .reduceOption(_ && _).getOrElse(lit(true))
        validated.withColumn("graft_prev", prev)
          .filter(col(opCol) === "d" || col("graft_prev").isNull ||
            !(col("graft_prev").getField(opCol) === "u" && sameAttrs))
          .drop("graft_prev")
      }
    survivors
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .filter(col(opCol) === "u")
      .select(keys.map(col) ++ carryCols.map(col) ++ attrs.map(col) ++ Seq(
        col(versionCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current")): _*)
  }

  /** Snapshot diff — the dataset-versioning primitive: classify every key of
    * two versions of a keyed table as `added` (only in `v2`), `removed`
    * (only in `v1`), `changed` (present in both, some non-key column
    * differs) or `unchanged`.
    *
    * Non-key columns compare by a 64-bit xxhash64 DIGEST computed at the
    * scan, not column-by-column at the join (r21, guide §8: "make every
    * shuffle but the last operate on a lightweight proxy"): the classifying
    * full-outer join shuffles (key, 8-byte digest) per side instead of the
    * full row payload — for a text corpus that removes the document bodies
    * from BOTH exchanges and both sort buffers of the diff, and column
    * pruning now reaches the scan for every non-key column a consumer does
    * not ask for. The digest interleaves a per-column `isnull` flag with
    * each value, so NULL-vs-value and NULL-position differences hash apart
    * exactly as the old per-column `<=>` chain distinguished them
    * (MergeOpsSpec pins the discrimination cases). Equal digests ⇒
    * `unchanged` is exact up to 64-bit hash collisions (~5·10⁻²⁰ per
    * compared pair — the same fingerprint-equality stance as
    * q_dedup_fingerprint); Spark's xxhash64 canonicalizes NaN and -0.0 the
    * same way `<=>` does, so double columns keep their semantics.
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
    def side(df: DataFrame, tag: String): DataFrame = {
      val digest =
        if (nonKey.isEmpty) lit(0L)
        else xxhash64(nonKey.flatMap(c => Seq(isnull(col(c)), col(c))): _*)
      df.select(lit(1).as(s"graft_$tag") +:
        keys.map(k => col(k).as(s"${tag}_$k")) :+
        digest.as(s"${tag}_graft_digest"): _*)
    }
    val a = side(v1, "a")
    val b = side(v2, "b")
    val cond = keys.map(k => col(s"a_$k") === col(s"b_$k")).reduce(_ && _)
    a.join(b, cond, "full_outer")
      .withColumn("status",
        when(col("graft_a").isNull, "added")
          .when(col("graft_b").isNull, "removed")
          .when(col("a_graft_digest") === col("b_graft_digest"), "unchanged")
          .otherwise("changed"))
      .select(keys.map(k => coalesce(col(s"a_$k"), col(s"b_$k")).as(k)) :+ col("status"): _*)
  }
}
