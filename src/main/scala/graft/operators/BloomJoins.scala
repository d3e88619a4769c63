package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi-join: build a Bloom filter over the small side's
  * join keys, prune the large side BEFORE its shuffle with a per-row
  * membership test, then take the exact semi-join on the survivors. The
  * result is EXACTLY the plain semi-join (Bloom false positives are removed
  * by the final join; negatives cannot occur), but the large side's shuffle
  * carries only `|matches| + fpp·|large|` rows instead of `|large|` — at
  * 100 TB the dominant cost of a selective semi-join is exactly that
  * exchange. This is the same runtime-filter idea Spark's AQE applies when
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` fires, exposed as an
  * explicit operator for when the planner can't see the opportunity (filter
  * computed in another job, non-equi pre-transformations, or a persisted
  * filter reused across queries).
  *
  * Built on Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * (the expressions injected by that AQE rule) through the graft bridge —
  * codegen'd membership tests, no UDF. The filter bytes are collected
  * driver-side: `numBits/8` bytes (default 1 MB) regardless of small-side
  * row count — the same volume the engine's own runtime filter broadcasts.
  */
object BloomJoins {

  /** `large ⋉ small` on `keys` (left-semi), Bloom-pruned before the shuffle.
    *
    * @param expectedItems sizing hint: distinct small-side keys expected.
    * @param numBits       filter size in bits (8M bits = 1 MB ≈ 1% fpp at
    *                      1M items).
    */
  def bloomSemiJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      expectedItems: Long = 1000000L,
      numBits: Long = 8L * 1024 * 1024): DataFrame = {
    require(keys.nonEmpty)
    import org.apache.spark.sql.graft.bridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

    def keyHash(df: DataFrame): Column = xxhash64(keys.map(df(_)): _*)

    val agg = new BloomFilterAggregate(
      bridge.expression(keyHash(small)),
      Literal(expectedItems), Literal(numBits))
    val bloomBytes = small
      .select(bridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)

    val pruned =
      if (bloomBytes == null) large.limit(0) // empty small side: nothing can match
      else large.filter(bridge.column(BloomFilterMightContain(
        Literal(bloomBytes, org.apache.spark.sql.types.BinaryType),
        bridge.expression(keyHash(large)))))
    pruned.join(small.select(keys.map(col): _*).distinct(), keys.toIndexedSeq, "left_semi")
  }
}
