package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for: the as-of join (nearest
  * predecessor/successor per key — kdb's `aj`, pandas `merge_asof`, DuckDB
  * `ASOF JOIN`) and the point-in-interval range join. Both are expressed on
  * primitives Catalyst already optimizes — no custom physical operator is
  * needed because the semantics decompose into window/equi-join shapes:
  *
  *  - [[asofJoin]] is JOIN-FREE: both sides union into one relation, one
  *    window pass per key picks each left row's latest preceding (or
  *    earliest following) right row. One shuffle total, keyed on the join
  *    keys; no candidate blow-up, no range predicate for the planner to
  *    mis-plan into a broadcast-nested-loop. This is the classic
  *    union-merge formulation a native engine would run, laid out so the
  *    whole pass is a single hash exchange + sort (both AQE-visible).
  *  - [[rangeJoin]] buckets intervals at a caller-chosen width: intervals
  *    explode to the buckets they cover, points map to exactly one bucket,
  *    and the match becomes a plain equi-join on (keys…, bucket) + an exact
  *    containment filter. A point's bucket intersects a covering interval's
  *    bucket list exactly once, so no pair-dedup stage is needed. Work is
  *    |points| + Σ⌈span/width⌉ join rows — never |points|·|intervals| —
  *    and the join key is high-cardinality (AQE-splittable on skew).
  *  - [[intervalJoin]] extends the same bucket index to interval×interval
  *    OVERLAP, keeping each pair exactly once (overlap-start-bucket rule)
  *    with no dedup stage.
  */
object TemporalJoins {

  /** Exact floor-division of a LONG column by a positive constant, safe for
    * the full long range (double-division `floor(x / w)` corrupts beyond
    * 2⁵³ — event timestamps in nanos live there).
    */
  private[graft] def floorDiv(x: Column, w: Long): Column = {
    val m = ((x % w) + w) % w
    call_function("div", x - m, lit(w))
  }

  /** As-of join: for each `left` row, attach the `right` row with the same
    * `keys` and the greatest `rightTime` ≤ `leftTime` (`direction =
    * "backward"`, inclusive) or smallest `rightTime` ≥ `leftTime`
    * (`"forward"`). Left-outer semantics: unmatched left rows keep null
    * payload columns. `tolerance` (same unit as the time columns, which must
    * be numeric) nulls out matches farther than the bound.
    *
    * The right payload is every right column except `keys` (including
    * `rightTime`, so the match distance is computable downstream); payload
    * names must not clash with left's — alias before calling.
    *
    * Determinism: right rows tied on (keys, time) are won by the greatest
    * payload struct (lexicographic). Dedup the right side per (keys, time)
    * upstream when a specific winner is required — that is also what makes
    * the result comparable to engines with unspecified tie behavior.
    *
    * Scale: ONE shuffle (hash by `keys` for the window sort), zero joins.
    * A pathologically hot key serializes into one task — the same skew
    * profile as any per-key window; pre-split hot keys upstream if needed.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val leftCols = left.columns.toSeq
    val payload = right.columns.toSeq.filterNot(keys.contains)
    val clash = payload.intersect(leftCols)
    require(clash.isEmpty, s"right payload columns clash with left: $clash — alias them first")

    val nonKeyLeft = leftCols.filterNot(keys.contains)
    // Right rows first (side 0) at equal times so an inclusive match is
    // visible to its left row; payload breaks right-side ties deterministically.
    val r = right.select(
      keys.map(col) ++
        nonKeyLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightTime).as("__graft_t"), lit(0).as("__graft_side"),
          struct(payload.map(col): _*).as("__graft_rp")): _*)
    val rpType = r.schema("__graft_rp").dataType
    val l = left.select(
      keys.map(col) ++ nonKeyLeft.map(col) ++
        Seq(col(leftTime).as("__graft_t"), lit(1).as("__graft_side"),
          lit(null).cast(rpType).as("__graft_rp")): _*)

    val t = if (direction == "backward") col("__graft_t").asc else col("__graft_t").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(t, col("__graft_side").asc, col("__graft_rp").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = r.unionByName(l)
      .withColumn("__graft_m", last(col("__graft_rp"), ignoreNulls = true).over(w))
      .filter(col("__graft_side") === 1)
    val bounded = tolerance match {
      case Some(tol) =>
        val dist =
          if (direction == "backward") col("__graft_t") - col(s"__graft_m.$rightTime")
          else col(s"__graft_m.$rightTime") - col("__graft_t")
        matched.withColumn("__graft_m", when(dist <= tol, col("__graft_m")))
      case None => matched
    }
    bounded.select(leftCols.map(col) ++ payload.map(c => col(s"__graft_m.$c").as(c)): _*)
  }

  /** Range (point-in-interval) join: inner-join `points` rows to every
    * `intervals` row sharing `keys` with `startCol ≤ pointCol ≤ endCol`
    * (inclusive both ends; null times never match, as in SQL BETWEEN).
    * Output: all point columns + interval payload (names must not clash).
    *
    * `bucketWidth` trades fan-out for join selectivity: each interval emits
    * ⌈span/width⌉+1 index rows, each point exactly one. Pick it near the
    * TYPICAL interval span — a width far below the span multiplies the
    * interval side; far above it, each bucket degenerates toward a
    * block-nested loop within the bucket. Time columns must be LONG
    * (bucketing is exact integer floor-division over the full range).
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val clash = intervals.columns.toSeq.filterNot(keys.contains)
      .intersect(points.columns.toSeq.filterNot(keys.contains))
    require(clash.isEmpty, s"interval payload columns clash with points: $clash — alias them first")

    val pb = points.withColumn("__graft_bk", floorDiv(col(pointCol), bucketWidth))
    val ib = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__graft_bk",
        explode(sequence(floorDiv(col(startCol), bucketWidth),
          floorDiv(col(endCol), bucketWidth))))
    pb.join(ib, (keys :+ "__graft_bk").toIndexedSeq)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__graft_bk")
  }

  /** Interval-overlap join: inner-join `left` to every `right` row sharing
    * `keys` whose `[rightStart, rightEnd]` overlaps `[leftStart, leftEnd]`
    * (closed intervals — touching endpoints count; null bounds never
    * match). Output: all left columns + right payload (names must not
    * clash; alias first). Time columns must be LONG.
    *
    * Same bucket-index shape as [[rangeJoin]], on BOTH sides: each interval
    * explodes to the ⌈span/width⌉+1 buckets it covers and the match is a
    * plain equi-join on (keys…, bucket) + the exact overlap predicate. A
    * pair overlapping across several shared buckets would match in each of
    * them, so the join keeps a pair only in the bucket containing the
    * OVERLAP'S START (`max(leftStart, rightStart)`) — every qualifying pair
    * survives exactly once by construction and no distinct/dedup stage
    * (with its extra wide shuffle) exists in the plan. Work is
    * Σ⌈span/width⌉ index rows per side, never |left|·|right|; the join key
    * is high-cardinality and AQE-splittable on skew.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val clash = right.columns.toSeq.filterNot(keys.contains)
      .intersect(left.columns.toSeq.filterNot(keys.contains))
    require(clash.isEmpty, s"right payload columns clash with left: $clash — alias them first")
    def banded(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(s) <= col(e))
      .withColumn("__graft_bk",
        explode(sequence(floorDiv(col(s), bucketWidth), floorDiv(col(e), bucketWidth))))
    banded(left, leftStart, leftEnd)
      .join(banded(right, rightStart, rightEnd), (keys :+ "__graft_bk").toIndexedSeq)
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd) &&
        floorDiv(greatest(col(leftStart), col(rightStart)), bucketWidth) === col("__graft_bk"))
      .drop("__graft_bk")
  }
}
