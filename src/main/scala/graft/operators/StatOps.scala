package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-level quality statistics for curation pipelines — the
  * z-score outlier screen every metrics/telemetry ingest runs before
  * training on the column.
  *
  * Determinism contract: moments are EXACT decimal sums (the value is
  * quantized to DECIMAL(18,4) once, then Σv and Σv² accumulate exactly, so
  * aggregation order cannot matter); the only doubles are a fixed chain of
  * exact-rounded casts, `+ − × /`, and `sqrt` — the one math function IEEE
  * 754 does bit-specify. A naive double `avg`/`stddev` would depend on
  * shuffle order and could not be hash-gated.
  *
  * Scale posture: one combiner-reduced aggregate per group (3 numbers of
  * state), broadcast back over the stream, salt-free per-group top-k window
  * over only the rows themselves.
  */
object StatOps {

  /** Top-`k` outliers per group, ranked by |z| descending (ties on `idCol`).
    * σ is the population standard deviation of the quantized values;
    * degenerate groups (σ = 0, e.g. a constant column) report z = 0 rather
    * than dividing by zero, and floating-point cancellation in
    * `E[x²] − E[x]²` is clamped at 0 before the sqrt.
    *
    * Output: (group, rnk 1..k, id, z).
    */
  def zscoreOutliers(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val vq = col(valueCol).cast("decimal(18,4)")
    val stats = df.groupBy(col(groupCol).as("graft_g"))
      .agg(count(lit(1)).as("n"), sum(vq).as("sv"), sum(vq * vq).as("svv"))
    val mean = col("sv").cast("double") / col("n")
    val variance = col("svv").cast("double") / col("n") - mean * mean
    val withSigma = stats.select(col("graft_g"), mean.as("mean"),
      sqrt(greatest(variance, lit(0.0))).as("sigma"))
    val z = when(col("sigma") === 0.0, lit(0.0))
      .otherwise((vq.cast("double") - col("mean")) / col("sigma"))
    val w = Window.partitionBy(col(groupCol)).orderBy(abs(col("z")).desc, col(idCol).asc)
    df.join(broadcast(withSigma), col(groupCol) === col("graft_g"))
      .withColumn("z", z)
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .select(col(groupCol), col("rnk"), col(idCol), col("z"))
  }
}
