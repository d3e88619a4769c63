package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization primitives: turning an irregular observation
  * table into the dense, gap-free series downstream window/feature logic
  * assumes (the `pandas.resample().ffill()` shape SQL engines express with a
  * calendar spine + `IGNORE NULLS` window).
  */
object TimeSeriesOps {

  /** Densify `obs` to one row per `step` between each key's FIRST and LAST
    * observed `timeCol`, forward-filling every `fillCols` value from the
    * key's most recent observation. `is_observed` marks real rows. Nulls
    * *inside* an observed row are filled from older observations too —
    * standard ffill semantics; pre-coalesce upstream if an observed null
    * must stick.
    *
    * Contract: (`keys`, `timeCol`) unique and non-null per row ([[MergeOps
    * .lastWriteWins]] upstream collapses duplicate observations), `timeCol`
    * a DATE (or any `sequence`-steppable type matching `step`).
    *
    * Scale shape: one hash aggregate on `keys` for the (min, max) span, the
    * spine explodes per key with NO shuffle, one equi-join back on
    * (`keys`, `timeCol`), one per-key window for all fills (a single Window
    * operator — the fill columns share the frame). Spine size is
    * span/step per key — a key observed once a year at daily step inflates
    * 365×; choose `step` for the series' real grain. Hot keys serialize in
    * the window like any per-key sort.
    */
  def gapFill(
      obs: DataFrame,
      keys: Seq[String],
      timeCol: String,
      fillCols: Seq[String],
      step: Column = expr("interval 1 day")): DataFrame = {
    require(keys.nonEmpty, "gapFill needs at least one key column")
    require(fillCols.nonEmpty, "gapFill needs at least one fill column")
    val spine = obs.groupBy(keys.map(col): _*)
      .agg(min(col(timeCol)).as("graft_lo"), max(col(timeCol)).as("graft_hi"))
      .select(keys.map(col) :+
        explode(sequence(col("graft_lo"), col("graft_hi"), step)).as(timeCol): _*)
    val joined = spine.join(obs.withColumn("graft_obs", lit(true)),
      keys :+ timeCol, "left")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = fillCols.foldLeft(joined)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled
      .withColumn("is_observed", coalesce(col("graft_obs"), lit(false)))
      .drop("graft_obs")
  }

  /** Final exponentially-weighted moving average per key — the "current
    * smoothed value" of an irregular series:
    *
    *   ewma₀ = v₀;  ewmaᵢ = α·vᵢ + (1−α)·ewmaᵢ₋₁
    *
    * computed as ONE strict left fold over the (orderCol, tieCols)-sorted
    * observations, so the float-op sequence is fixed by the data alone —
    * bit-reproducible across engines and partitionings (pick α an exact
    * binary fraction and the literals are too). The recursive form is
    * NOT expressible as a window aggregate (each term rescales the whole
    * history), and a per-row-emitting fold would copy O(n²) accumulator
    * state — the per-key FINAL value is the O(n) shape.
    *
    * Scale: one key-partitioned aggregate; per-key memory is the series
    * length (collect + sort inside the group). Bound the series with a
    * time-window filter upstream for unbounded keys.
    */
  def ewmaLast(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: Column,
      tieCols: Seq[Column],
      valueCol: Column,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val obs = struct(
      (orderCol.as("o") +: tieCols.zipWithIndex.map { case (c, i) => c.as(s"t$i") }) :+
        valueCol.cast("double").as("v"): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(obs)).as("graft_os"))
      .select(keyCols.map(col) ++ Seq(
        size(col("graft_os")).as("n"),
        aggregate(
          slice(col("graft_os"), lit(2), size(col("graft_os")) - 1),
          element_at(col("graft_os"), 1).getField("v"),
          (acc, x) => lit(alpha) * x.getField("v") + lit(1.0 - alpha) * acc
        ).as("ewma")): _*)
  }
}
