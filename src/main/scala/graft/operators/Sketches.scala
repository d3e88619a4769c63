package graft.operators

import org.apache.spark.sql.Column

/** Sketch aggregates for cardinality work at 100 TB — bounded-state,
  * map-side-mergeable summaries where exact answers would shuffle the full
  * value set.
  *
  * Everything here is DETERMINISTIC by construction (a pure function of the
  * input value set), unlike `approx_count_distinct`'s HLL registers — which
  * is what lets each sketch carry a DuckDB oracle twin and a hash-exact
  * correctness gate.
  */
object Sketches {

  /** KMV bottom-k distinct-count sketch of a LONG hash column: returns
    * `struct(n_min, kth_hash, estimate)` — see
    * [[graft.functions.KmvSketch]]. Pair with
    * [[TextOps.polyHash]] (uniform on [0, Prime)) and pass
    * `range = TextOps.Prime`.
    */
  def kmvDistinct(hash: Column, k: Int, range: Long = TextOps.Prime): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.functions.KmvSketch(bridge.expression(hash), k, range)
      .toAggregateExpression())
  }

  /** Misra–Gries frequent-items candidates of a STRING column: the ≤ `k`
    * items that can have frequency > n/(k+1), as a sorted array — see
    * [[graft.functions.MisraGries]]. Pair with an exact second pass over
    * just the candidates ([[CorpusOps.heavyHitters]]) for exact counts.
    */
  def mgCandidates(item: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.functions.MisraGries(bridge.expression(item), k)
      .toAggregateExpression())
  }
}
