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
}
