package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{EvalOps, VectorOps}

/** r22 fresh A/B for the IVF-PQ curve/trained checkpoint question (r21
  * VERDICT item 5 — the r17 "checkpoint measured slower" evidence predates
  * four rounds of changes). Times gate-shaped variants interleaved on one
  * session with sentinel tags:
  *
  *  - curve-asis / dims-asis: the declared q_ivfpq_curve(_dims) pipeline;
  *  - curve-truth / dims-truth: the brute-force `truth` top-k frame lazily
  *    local-checkpointed (it appears in EVERY per-config union branch —
  *    3–4 recomputes of a corpus-wide exact top-k per invocation unless
  *    ReuseExchange dedupes it);
  *  - curve-enc / nothing for dims: the probe gate's three branches share
  *    one (m=2, nCodes=8) codebook, so their corpus encode subtree is
  *    IDENTICAL — hoisted + checkpointed once (the dims gate's branches
  *    have genuinely different codebooks; no shared encode exists).
  *
  * Dev-only; not part of the driver surface.
  */
object IvfPqVariants {
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
    import spark.implicits._

    def curve(configs: Seq[(Int, Int, Int)], ckptTruth: Boolean,
        hoistEnc: Boolean): DataFrame = {
      val e = graft.Tables.t(spark, sfDir, "embeddings")
      val centroids = e.filter($"vec_id" < 10)
      val queriesDf = e.filter($"vec_id".between(100, 109))
      val truth0 = VectorOps.topK(e, queriesDf, "vec_id", "embedding", k = 3)
        .select($"query_id".as("doc_i"), $"neighbor_id".as("doc_j"))
      val truth = if (ckptTruth) truth0.localCheckpoint(false) else truth0
      def mkCbs(m: Int, nCodes: Int) = {
        val sd = 64 / m
        val res = VectorOps.ivfResiduals(
          e.filter($"vec_id".between(20, 19 + nCodes)),
          "vec_id", "embedding", centroids)
        res.select(explode(array((0 until m).map(sub =>
            struct(lit(sub).as("sub"), $"id".as("cid"),
              slice($"rvec", sub * sd + 1, sd).as("cvec"))): _*)).as("cb"))
          .select($"cb.sub".as("sub"), $"cb.cid".as("cid"), $"cb.cvec".as("cvec"))
      }
      val sharedEnc: Option[DataFrame] =
        if (hoistEnc && configs.map(c => (c._1, c._2)).distinct.size == 1) {
          val (m, nc, _) = configs.head
          Some(VectorOps.ivfPqEncode(e, "vec_id", "embedding", centroids,
            mkCbs(m, nc), m = m, dim = 64).localCheckpoint(false))
        } else None
      def branch(m: Int, nCodes: Int, nProbe: Int) = {
        val cbs = mkCbs(m, nCodes)
        val enc = sharedEnc.getOrElse(
          VectorOps.ivfPqEncode(e, "vec_id", "embedding", centroids,
            cbs, m = m, dim = 64))
        EvalOps.pairSetPrf(
          VectorOps.ivfPqSearch(enc, centroids, queriesDf, "vec_id",
              "embedding", cbs, m = m, dim = 64, k = 3, nProbe = nProbe)
            .select($"query_id".as("doc_i"), $"neighbor_id".as("doc_j")),
          truth)
          .select(lit(m).as("m"), lit(nCodes).as("n_codes"),
            lit(nProbe).as("n_probe"), $"tp", $"fp", $"fn",
            $"precision", $"recall", $"f1")
      }
      configs.map { case (m, nc, np) => branch(m, nc, np) }
        .reduce(_ unionByName _)
        .orderBy($"m", $"n_codes", $"n_probe")
    }

    val probeCfg = Seq((2, 8, 1), (2, 8, 2), (2, 8, 3))
    val dimsCfg = Seq((1, 8, 3), (2, 8, 3), (2, 16, 3), (4, 8, 3))
    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("curve-asis ", () => curve(probeCfg, ckptTruth = false, hoistEnc = false)),
      ("curve-truth", () => curve(probeCfg, ckptTruth = true, hoistEnc = false)),
      ("curve-enc  ", () => curve(probeCfg, ckptTruth = true, hoistEnc = true)),
      ("dims-asis  ", () => curve(dimsCfg, ckptTruth = false, hoistEnc = false)),
      ("dims-truth ", () => curve(dimsCfg, ckptTruth = true, hoistEnc = false)))

    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 10000000L, 1, 32).selectExpr("id % 97 AS k", "id")
        .groupBy("k").sum("id").write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    sentinel() // warm-up
    for (r <- 1 to reps; (name, mk) <- variants) {
      val s = sentinel()
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val n = if (r == 1) mk().count() else -1L
      println(f"VARIANT $name rep=$r sec=$dt%.2f sentinel=$s%.3f rows=$n")
    }
    spark.stop()
  }
}
