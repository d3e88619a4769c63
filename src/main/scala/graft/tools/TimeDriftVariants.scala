package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{SimHash, TextOps}

/** One-off bisect harness for the r21 tokenDrift 64 g adjudication: times
  * the four combinations of {hash vs string token keys} × {lazy
  * localCheckpoint vs recompute-per-consumer} on the SAME session, so the
  * 64 g A/B can attribute the big-heap cost to the right ingredient.
  * Dev-only; not part of the driver surface.
  */
object TimeDriftVariants {
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

    def drift(tok: Column, checkpoint: Boolean): DataFrame = {
      val t = docs.select(col("source").as("src"), explode(tok).as("tok"))
      val cs0 = t.groupBy(col("src"), col("tok")).agg(count(lit(1)).as("c"))
      val cs = if (checkpoint) cs0.localCheckpoint(eager = false) else cs0
      val tot = cs.groupBy(col("tok")).agg(sum(col("c")).as("t"))
      val ns = cs.groupBy(col("src")).agg(sum(col("c")).as("n"))
      val tt = cs.agg(sum(col("c")).as("tt"))
      def d18(c: Column) = c.cast("decimal(18,0)")
      def d19(c: Column) = c.cast("decimal(19,0)")
      val pres = cs.join(tot, Seq("tok"))
        .join(broadcast(ns), Seq("src"))
        .crossJoin(broadcast(tt))
        .groupBy(col("src"))
        .agg(
          sum(abs(d18(col("c")) * d19(col("tt") - col("n")) -
            d18(col("t") - col("c")) * d19(col("n")))).as("num_present"),
          sum(col("t")).as("t_present"))
      pres.join(broadcast(ns), Seq("src")).crossJoin(broadcast(tt))
        .select(col("src"), col("n"), (col("tt") - col("n")).as("m"),
          (col("num_present") + d18(col("n")) * d19(col("tt") - col("t_present")))
            .cast("decimal(38,0)").cast("string").as("tvd_num"))
        .orderBy(col("src"))
    }

    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 10000000L, 1, 32).selectExpr("id % 97 AS k", "id")
        .groupBy("k").sum("id").write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("hash+ckpt   ", () => drift(SimHash.tokenWideHashes(col("text")), checkpoint = true)),
      ("hash-ckpt   ", () => drift(SimHash.tokenWideHashes(col("text")), checkpoint = false)),
      ("string+ckpt ", () => drift(TextOps.tokens(col("text")), checkpoint = true)),
      ("string-ckpt ", () => drift(TextOps.tokens(col("text")), checkpoint = false)),
      ("xxh64+ckpt  ", () => drift(transform(TextOps.tokens(col("text")), t => xxhash64(t)), checkpoint = true)))
    sentinel() // warm-up
    for (r <- 1 to reps; (name, mk) <- variants) {
      val s = sentinel()
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"VARIANT $name rep=$r sec=$dt%.2f sentinel=$s%.3f")
    }
    spark.stop()
  }
}
