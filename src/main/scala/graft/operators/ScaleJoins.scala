package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for the two big-cluster failure modes Catalyst cannot
  * always fix alone: repeated shuffles of the same fact table (→ bucketing)
  * and hot keys that funnel a shuffle into a handful of straggler tasks
  * (→ salting). Both are plain public Spark APIs; what this module adds is
  * the policy and the tests proving the plan shape (no Exchange over a
  * bucketed side; a salted join's results are identical to the plain join).
  */
object ScaleJoins {

  /** Persist `df` as a bucketed+sorted table: `n` buckets by `cols`, the
    * layout that lets every later equi-join or aggregation on `cols` read
    * co-located buckets with NO shuffle. At 100 TB this is the difference
    * between re-shuffling the fact table per query and shuffling it once at
    * ingest.
    */
  def writeBucketed(df: DataFrame, table: String, cols: Seq[String], n: Int): Unit =
    df.write
      .bucketBy(n, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)

  /** Salted equi-join for skewed keys. The skewed (large) side gets a
    * deterministic salt from its row content; the small side is replicated
    * `saltBuckets` times so every (key, salt) pair still meets its match —
    * a hot key's rows now spread over `saltBuckets` tasks instead of one.
    * Output equals the plain inner equi-join exactly (verified in spec).
    *
    * Use when AQE's skew-join splitting isn't available (e.g. the join is
    * under an operator AQE won't rewrite) or the skew is known up front.
    * `saltExpr` defaults to a hash of the large side's whole row, which is
    * deterministic for retries within a task attempt's input.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      saltExpr: Option[Column] = None): DataFrame = {
    require(saltBuckets > 0)
    val salt = saltExpr.getOrElse(
      pmod(hash(large.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    val saltedLarge = large.withColumn("graft_salt", salt)
    val replicatedSmall = small.withColumn("graft_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLarge.join(replicatedSmall, keys :+ "graft_salt").drop("graft_salt")
  }

  /** Co-located join of two tables previously written via [[writeBucketed]]
    * with the same bucket spec: reads align bucket-to-bucket, no Exchange.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)

  /** Persist `df` hive-partitioned by `cols` (one directory level per
    * column). The complementary lever to [[writeBucketed]]: bucketing
    * co-locates high-cardinality JOIN keys; directory partitioning makes
    * low-cardinality FILTER columns (date, source, event type) prunable at
    * planning time — a predicate on `cols` never opens the other
    * directories' files, so "last day of a 3-year event log" reads 0.1% of
    * the bytes instead of scanning 100 TB to discard 99.9%. Keep `cols`
    * low-cardinality: every distinct value is a directory, and millions of
    * tiny files are their own scale failure.
    */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.partitionBy(cols: _*).mode("overwrite").parquet(path)

  /** Read a [[writePartitioned]] layout. Partition columns come back from
    * directory names (typed by partition-column inference); predicates on
    * them become `PartitionFilters` in the scan — plan-shape-guarded in
    * PlanShapeSpec, not taken on faith.
    */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
