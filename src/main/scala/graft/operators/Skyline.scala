package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) under minimize-both-dimensions semantics:
  * a point survives iff no other point is ≤ on both dimensions and < on at
  * least one. Part of the extension surface (the reference has no analog);
  * the classic "best price/size trade-offs" query over any measure pair.
  *
  * Scale posture (100 TB): the naive formulation is an all-pairs dominance
  * self-join — quadratic, never acceptable. This implementation is the
  * grid-pruned two-phase plan:
  *
  *  1. Fixed-width bucket the x axis (bounds from one 2-value aggregate —
  *     a bounded driver collect, same convention as RankOps' range bounds).
  *  2. WITHIN each bucket, a point is locally dominated iff the running
  *     minimum of y over the lexicographically (x, y)-preceding points is
  *     ≤ its own y — a single window partitioned BY BUCKET, so the sort
  *     parallelizes across buckets (no global single-partition sort).
  *  3. ACROSS buckets, any point of an earlier bucket has strictly smaller
  *     x (fixed-width bucketing is monotone in x), so a point is
  *     cross-dominated iff the prefix-minimum of per-bucket min-y over all
  *     EARLIER buckets is ≤ its y. The per-bucket min table has one row
  *     per bucket — the prefix scan runs as a tiny single-partition window
  *     and broadcasts back.
  *
  * Both tests are conjunctive and complete: a dominator lives either in
  * the same bucket (caught by 2 — it lexicographically precedes) or in an
  * earlier one (caught by 3); later buckets have strictly larger x and
  * cannot dominate. Total cost: one distinct-point aggregate, one
  * bucket-partitioned window, one O(#buckets) side table — no self-join.
  *
  * Determinism: callers pass integral dimensions (quantize doubles first —
  * the q_embed_centroid integer-units playbook); dominance and the window
  * frames are then exact integer comparisons with no tie ambiguity.
  *
  * @param points distinct rows per (x, y) point (callers aggregate
  *               duplicates first; duplicate coordinates would make the
  *               running-min frame see a point's own twin as a dominator)
  * @param xCol   integral column, minimized
  * @param yCol   integral column, minimized
  * @param buckets target x-axis bucket count (actual count adapts to the
  *               value range; degenerate single-value ranges collapse to
  *               one bucket and the plan degrades to the plain window)
  */
object Skyline {

  def skyline2dMin(points: DataFrame, xCol: String, yCol: String,
                   buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val x = col(xCol)
    val y = col(yCol)
    // Bounded driver collect: two longs, the same convention as the
    // documented range-bounds map in RankOps.
    val bounds = points.agg(min(x).cast("long"), max(x).cast("long")).head()
    if (bounds.isNullAt(0)) return points.limit(0)
    val (xmin, xmax) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (xmax - xmin) / buckets + 1L)

    val b = points.withColumn("_bkt", ((x - xmin) / width).cast("long"))
    val localW = Window.partitionBy(col("_bkt")).orderBy(x, y)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = b.withColumn("_mloc", min(y).over(localW))

    val bucketMins = b.groupBy(col("_bkt")).agg(min(y).as("_bmin"))
    // One row per bucket: the single-partition window is O(#buckets), tiny.
    val prefixW = Window.orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = bucketMins
      .withColumn("_mprev", min(col("_bmin")).over(prefixW))
      .select(col("_bkt"), col("_mprev"))

    local.join(broadcast(prefix), "_bkt")
      .filter((col("_mloc").isNull || col("_mloc") > y) &&
        (col("_mprev").isNull || col("_mprev") > y))
      .drop("_bkt", "_mloc", "_mprev")
  }

  /** Per-group 2D skyline ("best trade-offs per category"): within each
    * group a point survives iff no same-group point dominates it. Here the
    * grid prune is unnecessary — the window PARTITIONED BY the group keys
    * already parallelizes across groups, so the whole frontier is ONE
    * exchange on the group keys plus the lexicographic running-min test
    * (a point is dominated iff the min y over its (x, y)-preceding
    * same-group points is ≤ its own y — the same completeness argument as
    * [[skyline2dMin]] step 2, now over the whole group). The global
    * variant's grid exists precisely for the degenerate case this method
    * should not be used for: one group so large its sort must split
    * across cores.
    *
    * Same caller contract as [[skyline2dMin]]: rows distinct per
    * (group, x, y), integral dimensions.
    */
  def skyline2dMinPerGroup(points: DataFrame, groupCols: Seq[String],
                           xCol: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "per-group skyline needs group columns")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(xCol), col(yCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    points.withColumn("_m", min(col(yCol)).over(w))
      .filter(col("_m").isNull || col("_m") > col(yCol))
      .drop("_m")
  }

  /** PER-GROUP d-dimensional minimize-all skyline (d ≥ 2) — the
    * composition [[skyline2dMinPerGroup]] (per-group, 2D-only window
    * trick) and [[skylineGridMin]] (d-dim, global-only grid) don't cover.
    * Neither parent's plan generalizes: the running-min window is 2D-only,
    * and the grid's driver cell prune would collect O(#groups · cells)
    * summaries — unbounded in the group count. This is instead the
    * MapReduce-skyline two-phase the literature settled on for the
    * partitioned case:
    *
    *  1. LOCAL skylines: one `mapPartitions` fold keeps an in-memory
    *     frontier per group PER PARTITION (whatever the incoming
    *     partitioning — no repartition, no one-task-per-group). A point
    *     dominated globally is dominated within its group, and its
    *     dominating SKYLINE witness survives every local fold, so the
    *     union of local frontiers is a COMPLETE candidate set. Memory per
    *     task is the partition's frontier mass, not its row count.
    *  2. MERGE: an exact per-group dominance LEFT ANTI self-join over the
    *     candidates — equi-keyed on the group columns (null-safe), with
    *     dominance as the residual predicate. The quadratic risk lives in
    *     Σ_g |candidates_g|², bounded by (partitions × frontier)² per
    *     group — frontier-sized, not data-sized; anticorrelated inputs
    *     pay honestly, as in every skyline algorithm.
    *
    * The RDD fold is the repo's documented last-resort tier (genuine
    * per-partition imperative state — a frontier buffer — that no window
    * frame expresses for d > 2). All input columns pass through.
    *
    * Same caller contract as [[skyline2dMin]]: rows distinct per
    * (group, dims), integral non-null dimensions.
    */
  def skylineMinPerGroup(points: DataFrame, groupCols: Seq[String],
                         dimCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "per-group skyline needs group columns")
    require(dimCols.size >= 2, "need at least 2 dimensions")
    val schema = points.schema
    // Plan-time type validation (r16 ADVICE): the local fold's frontier
    // map keys defensively copy UTF8String values out of the reused
    // UnsafeRow buffer, but an array/struct/map/binary group column would
    // still alias the recycled buffer (or, for binary, compare by
    // reference) and silently corrupt grouping — and a non-integral dim
    // would otherwise only fail at executor runtime. Fail loudly on the
    // driver instead.
    dimCols.foreach { c =>
      val t = schema(schema.fieldIndex(c)).dataType
      require(t == org.apache.spark.sql.types.LongType ||
          t == org.apache.spark.sql.types.IntegerType,
        s"skylineMinPerGroup: dim column $c must be INT or BIGINT " +
          s"(got ${t.sql}) — quantize doubles first (the q_embed_centroid " +
          "integer-units playbook)")
    }
    groupCols.foreach { c =>
      import org.apache.spark.sql.types._
      val t = schema(schema.fieldIndex(c)).dataType
      val atomic = t match {
        case IntegerType | LongType | ShortType | ByteType | BooleanType |
             StringType | FloatType | DoubleType | DateType | TimestampType |
             TimestampNTZType => true
        case _: DecimalType => true
        case _ => false
      }
      require(atomic,
        s"skylineMinPerGroup: group column $c must be an atomic non-binary " +
          s"type (got ${t.sql}) — nested/binary keys cannot be safely " +
          "copied out of the reused row buffer")
    }
    val gIdx = groupCols.map(schema.fieldIndex).toArray
    val dIdx = dimCols.map(schema.fieldIndex).toArray
    val d = dIdx.length
    val localFrontier = points.queryExecution.toRdd.mapPartitions { it =>
      import org.apache.spark.sql.catalyst.InternalRow
      def dims(r: InternalRow): Array[Long] =
        dIdx.map(i => schema(i).dataType match {
          case org.apache.spark.sql.types.LongType => r.getLong(i)
          case org.apache.spark.sql.types.IntegerType => r.getInt(i).toLong
          case t => sys.error(s"skylineMinPerGroup: non-integral dim type $t")
        })
      def dom(a: Array[Long], b: Array[Long]): Boolean = {
        var le = true; var lt = false; var i = 0
        while (i < d) { le &&= a(i) <= b(i); lt ||= a(i) < b(i); i += 1 }
        le && lt
      }
      val frontiers = scala.collection.mutable.HashMap
        .empty[Seq[Any], scala.collection.mutable.ArrayBuffer[(Array[Long], InternalRow)]]
      it.foreach { row =>
        val p = dims(row)
        // toRdd's UnsafeRow iterator REUSES buffers: string keys must be
        // copied out or the map keys silently mutate under later rows
        // (primitives box to fresh values; the kept rows are copied below).
        val key: Seq[Any] = gIdx.toSeq.map(i =>
          if (row.isNullAt(i)) null
          else row.get(i, schema(i).dataType) match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
            case v => v
          })
        val f = frontiers.getOrElseUpdate(key,
          scala.collection.mutable.ArrayBuffer.empty)
        if (!f.exists { case (q, _) => dom(q, p) }) {
          f.filterInPlace { case (q, _) => !dom(p, q) }
          f += ((p, row.copy()))
        }
      }
      frontiers.valuesIterator.flatMap(_.iterator.map(_._2))
    }
    val spark = points.sparkSession
    val cand = org.apache.spark.sql.graft.bridge
      .internalCreateDataFrame(spark, localFrontier, schema)
    val p = cand.as("p")
    val q = cand.as("q")
    val keyEq = groupCols.map(c => col(s"p.$c") <=> col(s"q.$c")).reduce(_ && _)
    val le = dimCols.map(c => col(s"q.$c") <= col(s"p.$c")).reduce(_ && _)
    val lt = dimCols.map(c => col(s"q.$c") < col(s"p.$c")).reduce(_ || _)
    p.join(q, keyEq && le && lt, "left_anti")
  }

  /** d-dimensional minimize-all skyline (d ≥ 2 — exercised at d = 3) via
    * the CELL-GRID prune: the running-min window trick is 2D-only (a
    * lexicographically-preceding point can have a smaller z but a LARGER
    * y), so higher dimensions use the grid algorithm the MapReduce-skyline
    * literature settled on:
    *
    *  1. Fixed-width bucket every dimension (bounds from one 2d-value
    *     aggregate). Cell summaries — per-cell min/max corner — aggregate
    *     to at most buckets^d rows, COLLECTED to the driver (bounded by
    *     the bucket knob, ≤ 4096 rows at the d=3 default; same bounded-
    *     collect convention as RankOps' range bounds).
    *  2. Driver-side cell prune: cell B dies if some cell A's MAX corner
    *     dominates B's MIN corner — then ANY point of A dominates EVERY
    *     point of B (a ≤ maxA ≤ minB ≤ b, strict where the corners are
    *     strict). If a point is dominated at all, it is dominated by a
    *     point of a SURVIVING cell (walk the dominating chain of cells —
    *     the corner order is acyclic — to a non-dominated cell), so
    *     pruned cells' points can be discarded entirely, as candidates
    *     AND as dominators.
    *  3. Candidate verify: the driver emits the cell-pair list
    *     (A, B) with minCorner(A) ≤ maxCorner(B) — "A may contain a
    *     dominator of a B point" — as a broadcast table; the points of
    *     surviving cells fan out along it and a LEFT ANTI equi-join on
    *     the cell-pair key (dominance as a residual predicate) keeps
    *     exactly the undominated points. No cartesian product anywhere —
    *     the quadratic risk lives in the cell-pair fanout, which the grid
    *     resolution bounds and anticorrelated inputs pay honestly (every
    *     skyline algorithm degrades there; the spec pins an anticorrelated
    *     case).
    *
    * Same caller contract as [[skyline2dMin]]: distinct integral points.
    */
  def skylineGridMin(points: DataFrame, dimCols: Seq[String],
                     bucketsPerDim: Int = 16): DataFrame = {
    require(dimCols.size >= 2, "need at least 2 dimensions")
    require(bucketsPerDim >= 1, s"bucketsPerDim must be >= 1, got $bucketsPerDim")
    val d = dimCols.size
    // The driver prune is O(cells²) over ≤ bucketsPerDim^d summaries — the
    // d=3/16 default is ≤ 4096 cells (≤ 1.7·10⁷ comparisons), but the SAME
    // default at d=4 would be ~65k cells and ~4·10⁹ corner comparisons,
    // silently breaking the bounded-driver-collect convention. Cap the
    // GRID (8192² ≈ 6.7·10⁷ comparisons worst-case — sub-second) and make
    // the caller choose a coarser resolution for high d instead.
    require(math.pow(bucketsPerDim.toDouble, d.toDouble) <= 8192.0,
      s"bucketsPerDim^d must be <= 8192 (got $bucketsPerDim^$d): the " +
        "cell-summary prune is a driver-side O(cells^2) pass — use a " +
        "coarser grid for higher dimensions")
    val dims = dimCols.map(col)
    // Bounded driver collect #1: 2d longs of dimension bounds.
    val boundCols = dims.flatMap(c => Seq(min(c).cast("long"), max(c).cast("long")))
    val bRow = points.agg(boundCols.head, boundCols.tail: _*).head()
    if (bRow.isNullAt(0)) return points.limit(0)
    val lows = (0 until d).map(i => bRow.getLong(2 * i))
    val widths = (0 until d).map(i =>
      math.max(1L, (bRow.getLong(2 * i + 1) - lows(i)) / bucketsPerDim + 1L))
    val cellId = (0 until d).map(i =>
        ((dims(i) - lows(i)) / widths(i)).cast("long"))
      .reduce((a, b) => a * (bucketsPerDim + 1) + b)
    val pc = points.withColumn("_cell", cellId)

    // Bounded driver collect #2: ≤ bucketsPerDim^d cell corner summaries.
    val cornerCols = dims.flatMap(c => Seq(min(c).cast("long"), max(c).cast("long")))
    val stats = pc.groupBy(col("_cell"))
      .agg(cornerCols.head, cornerCols.tail: _*)
      .collect()
      .map(r => (r.getLong(0),
        (0 until d).map(i => r.getLong(1 + 2 * i)).toArray,   // min corner
        (0 until d).map(i => r.getLong(2 + 2 * i)).toArray))  // max corner
    def domCorner(a: Array[Long], b: Array[Long]): Boolean = {
      var le = true; var lt = false; var i = 0
      while (i < d) { le &&= a(i) <= b(i); lt ||= a(i) < b(i); i += 1 }
      le && lt
    }
    val surviving = stats.filter { case (cb, lob, _) =>
      !stats.exists { case (ca, _, hia) => ca != cb && domCorner(hia, lob) }
    }
    val pairs = for {
      (ca, loa, _) <- surviving
      (cb, _, hib) <- surviving
      if (0 until d).forall(i => loa(i) <= hib(i))
    } yield (ca, cb)

    val spark = points.sparkSession
    import spark.implicits._
    val cand = pc.join(
      broadcast(surviving.map(_._1).toSeq.toDF("_cell")), "_cell")
    val pairsDf = broadcast(pairs.toSeq.toDF("_a_cell", "_b_cell"))
    val qCols = dimCols.map(c => col(c).as(s"_q_$c"))
    val doms = cand.select(col("_cell").as("_a_cell") +: qCols: _*)
      .join(pairsDf, "_a_cell")
    val strictSomewhere = dimCols.map(c => col(s"_q_$c") < col(c))
      .reduce(_ || _)
    val leEverywhere = dimCols.map(c => col(s"_q_$c") <= col(c))
      .reduce(_ && _)
    cand.join(doms,
        cand("_cell") === doms("_b_cell") && leEverywhere && strictSomewhere,
        "left_anti")
      .drop("_cell")
  }
}
