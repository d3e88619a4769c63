package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main — runs every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * emits one machine-readable JSON line (stdout + BENCH.json beside the cwd).
  *
  * Each query is materialized through the noop sink, NOT `.count()`:
  * under count, Catalyst's EliminateSorts removes final ORDER BYs and column
  * pruning deletes projection work, so scalar/string pipelines would never
  * execute and the numbers would measure scan+count only. The noop sink
  * consumes every row of every column downstream of the full plan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Deterministic query order (Map iteration order is arbitrary and puts
    // JVM/codegen warm-up cost on whichever query happens to run first).
    val names = SparkEntry.queries.keys.toSeq.sorted
    // One warm-up action so JIT/codegen/parquet-footer costs are not billed
    // to the first measured query.
    SparkEntry.queries(names.head)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val results = names.map { name =>
      val t0 = System.nanoTime()
      val ok =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          true
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // A failed query records null (not its truncated elapsed time) and is
    // excluded from the total, so breakage can't masquerade as speed.
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) f"$v%.3f" else "null")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(json)
    Files.writeString(Paths.get("BENCH.json"), json + "\n")
    spark.stop()
  }
}
