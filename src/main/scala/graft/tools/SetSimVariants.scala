package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{SetSimJoin, TextOps}

/** r22 bisect harness for the top non-iterative batch costs (r21 VERDICT
  * item 4): q_ngram_jaccard / q_containment. Times gate-level variants on
  * one session, interleaved with the contention sentinel:
  *
  *  - jacc-asis / cont-asis: the declared gate pipelines verbatim;
  *  - jacc-ckpt / cont-ckpt: the shingled input frame lazily
  *    local-checkpointed BEFORE the join, so the corpus is shingled ONCE
  *    instead of once per consumer subtree (the join reads the doc→tokens
  *    table ~5×: df census, both prefix sides, both verify sides);
  *  - jacc-nocensus / cont-nocensus: maxCandidates = Long.MaxValue, to
  *    price the default-loud candidate-mass census action alone.
  *
  * Dev-only; not part of the driver surface.
  */
object SetSimVariants {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def docs = graft.Tables.docs(spark, sfDir)

    def jaccG: DataFrame = docs
      .select(col("doc_id"), col("lang"), col("source"),
        TextOps.charShinglesPacked(col("text"), 3).as("gr"))
      .filter(length(col("text")) >= 3)
    def contG: DataFrame = docs
      .select(col("doc_id"), TextOps.wordShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)

    def jacc(g: DataFrame, maxCand: Long): DataFrame =
      SetSimJoin.jaccardJoin(g, "doc_id", "gr", Seq("lang", "source"),
        threshNum = 3, threshDen = 5,
        dfStrategy = SetSimJoin.DfStrategy.Packed, maxCandidates = maxCand)
    def cont(g: DataFrame, maxCand: Long): DataFrame =
      SetSimJoin.containmentJoin(g, "doc_id", "sh", Nil,
        threshNum = 9, threshDen = 10, maxCandidates = maxCand)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("jacc-nocensus ", () => jacc(jaccG, Long.MaxValue)),
      ("jacc-asis     ", () => jacc(jaccG, SetSimJoin.DefaultMaxCandidates)),
      ("jacc-ckpt     ", () => jacc(jaccG.localCheckpoint(false), SetSimJoin.DefaultMaxCandidates)),
      ("cont-nocensus ", () => cont(contG, Long.MaxValue)),
      ("cont-asis     ", () => cont(contG, SetSimJoin.DefaultMaxCandidates)),
      ("cont-ckpt     ", () => cont(contG.localCheckpoint(false), SetSimJoin.DefaultMaxCandidates)),
      ("jacccap-asis  ", () => SetSimJoin.jaccardJoin(jaccG, "doc_id", "gr",
        Seq("lang", "source"), threshNum = 3, threshDen = 5,
        dfStrategy = SetSimJoin.DfStrategy.Packed, maxDf = Some(4L))),
      ("jacccap-ckpt  ", () => SetSimJoin.jaccardJoin(jaccG.localCheckpoint(false),
        "doc_id", "gr", Seq("lang", "source"), threshNum = 3, threshDen = 5,
        dfStrategy = SetSimJoin.DfStrategy.Packed, maxDf = Some(4L))),
      ("contcap-asis  ", () => SetSimJoin.containmentJoin(contG, "doc_id", "sh",
        Nil, threshNum = 9, threshDen = 10, maxDf = Some(3L))),
      ("contcap-ckpt  ", () => SetSimJoin.containmentJoin(contG.localCheckpoint(false),
        "doc_id", "sh", Nil, threshNum = 9, threshDen = 10, maxDf = Some(3L))))

    // Phase attribution for the census gap: time the tokenDfTable
    // materialization + guard aggregate alone (the census's own work),
    // mirroring SetSimJoin.tokenDfTable/guardCandidateMass.
    def censusOnly(g: DataFrame, setCol: String, blockCols: Seq[String]): Unit = {
      val bc = blockCols.map(col)
      val ex = g.select(col("doc_id").as("sj_id") +:
        explode(col(setCol)).as("sj_tok") +: bc: _*)
      val dfTab = ex.groupBy(bc :+ col("sj_tok"): _*)
        .agg(count(lit(1)).as("sj_df")).localCheckpoint(false)
      val t0 = System.nanoTime()
      val r = dfTab.agg(
        try_sum((col("sj_df").cast("decimal(20,0)") *
          (col("sj_df") - 1).cast("decimal(20,0)")).cast("decimal(38,0)")),
        count(lit(1))).head()
      val tGuard = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n = dfTab.limit(4194305).collect().length
      val tCollect = (System.nanoTime() - t1) / 1e9
      println(f"CENSUS guard=$tGuard%.2f collect=$tCollect%.2f " +
        f"dfRows=$n mass=${r.get(0)}")
    }
    censusOnly(jaccG, "gr", Seq("lang", "source"))
    censusOnly(contG, "sh", Nil)

    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 10000000L, 1, 32).selectExpr("id % 97 AS k", "id")
        .groupBy("k").sum("id").write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Optional variant-name filter (args 3+): the interleaved protocol
    // turned out to carry a strong POSITION artifact (async cleanup of the
    // previous variant's checkpoint blocks lands on whoever runs next —
    // the same variant read 6.1 s in slot 1 and 3.1 s in slot 2 across
    // two orderings), so decisive numbers come from one-variant-per-JVM
    // runs.
    val only = args.drop(2).toSet
    val picked = if (only.isEmpty) variants else variants.filter(v => only(v._1.trim))
    sentinel() // warm-up
    for (r <- 1 to reps; (name, mk) <- picked) {
      val s = sentinel()
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // rows checked untimed on the first rep only (variant equivalence).
      val n = if (r == 1) mk().count() else -1L
      println(f"VARIANT $name rep=$r sec=$dt%.2f sentinel=$s%.3f rows=$n")
    }
    spark.stop()
  }
}
