package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.operators._

/** LLM-training-data pipeline operators over the `documents`, `embeddings`
  * and `events` fixtures: deduplication (exact, fingerprint, MinHash-LSH,
  * SimHash, blocked n-gram Jaccard), similarity search (brute-force cosine
  * top-k and IVF-bucketed ANN), text analysis (stats, quality, language-ID,
  * rolling-hash fingerprints), event sessionization/windowing, and the
  * multimodal binary-column plumbing.
  *
  * Determinism conventions on top of [[RelationalQueries]]'s: similarity
  * thresholds are integer cross-multiplications (never float compares);
  * doubles that reach the output are either strict left-folds of exact
  * inputs (identical bit patterns in DuckDB, see [[graft.operators.VectorOps]])
  * or single arithmetic expressions over exact integer counts; epoch seconds
  * use flooring on both sides (DuckDB `CAST(epoch AS BIGINT)` ROUNDS).
  */
object PipelineQueries extends QueryDomain {

  private val parts: Seq[QueryDomain] =
    Seq(DedupQueries, TextAnalysisQueries, EventQueries, VectorQueries)

  // ++ silently SHADOWS duplicate keys (the r17 gate-name-collision trap);
  // force the collision loud at object init instead.
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val m = parts.map(_.queries).reduce(_ ++ _)
    require(m.size == parts.map(_.queries.size).sum,
      "duplicate gate name across query-family files — Map ++ would shadow one")
    m
  }

  val oracleSql: Map[String, String] = {
    val m = parts.map(_.oracleSql).reduce(_ ++ _)
    require(m.size == parts.map(_.oracleSql.size).sum,
      "duplicate oracle name across query-family files — Map ++ would shadow one")
    m
  }
}
