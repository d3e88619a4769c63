package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop protocol profiler for the staged-replay stream gates: replays
  * representative gate pipelines and prints the ENGINE'S own per-micro-batch
  * duration breakdown (`StreamingQuery.recentProgress.durationMs`:
  * addBatch / getBatch / latestOffset / queryPlanning / walCommit /
  * commitOffsets / triggerExecution) plus wall-clock phase times
  * (start / processAllAvailable / stop / sink read). The r21 verdict named
  * the 36-gate micro-batch protocol floor (~3–4 s each) the largest cost
  * block the driver can still see; this tool answers WHERE inside one gate
  * the floor lives, so the fix targets the real phase instead of folklore.
  *
  * Knobs (system properties, so `sbt "runMain ..."` A/Bs stay one-line):
  *   -Dprobe.parts=N      stream-clone shuffle partitions (default 8)
  *   -Dprobe.ck=PATH      streaming checkpoint root ("" = engine temp dir)
  *   -Dprobe.mfpt=N       maxFilesPerTrigger override (0 = gate default)
  *
  * Usage: runMain graft.queries.StreamProbe <sfDir> <reps> [gate ...]
  * Gates: windows (agg), cusum (buffered fMGWS), ksdrift (4-file doc gate).
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val gates = if (args.length > 2) args.drop(2).toSeq else Seq("windows", "cusum", "ksdrift")
    val parts = sys.props.getOrElse("probe.parts", "8")
    val ckRoot = sys.props.getOrElse("probe.ck", "")
    val mfptOverride = sys.props.getOrElse("probe.mfpt", "0").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", parts)
    if (ckRoot.nonEmpty) ss.conf.set("spark.sql.streaming.checkpointLocation", ckRoot)
    println(s"PROBE parts=$parts ck=${if (ckRoot.isEmpty) "tempdir" else ckRoot} mfpt=" +
      (if (mfptOverride == 0) "gate-default" else mfptOverride.toString))

    import ss.implicits._
    val ids = new java.util.concurrent.atomic.AtomicLong()

    def runOne(tag: String, build: () => org.apache.spark.sql.DataFrame): Unit = {
      (1 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        val df = build()
        def ms = (System.nanoTime() - t0) / 1e6
        val tBuild = ms
        val sink = s"probe_${tag}_${ids.incrementAndGet()}"
        val q = df.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        val tStart = ms
        try q.processAllAvailable() finally {
          val tPaa = ms
          val prog = q.recentProgress
          q.stop()
          val tStop = ms
          val n = ss.table(sink).count()
          val tRead = ms
          println(f"GATE $tag rep=$rep total=${tRead}%.0fms build=${tBuild}%.0f " +
            f"start=${tStart - tBuild}%.0f paa=${tPaa - tStart}%.0f " +
            f"stop=${tStop - tPaa}%.0f read=${tRead - tStop}%.0f rows=$n")
          prog.foreach { p =>
            val d = p.durationMs
            println(s"  batch=${p.batchId} rows=${p.numInputRows} " +
              s"trigger=${d.get("triggerExecution")} addBatch=${d.get("addBatch")} " +
              s"getBatch=${d.get("getBatch")} latestOffset=${d.get("latestOffset")} " +
              s"planning=${d.get("queryPlanning")} walCommit=${d.get("walCommit")} " +
              s"commitOffsets=${d.get("commitOffsets")} " +
              s"stateOps=${p.stateOperators.length}" +
              p.stateOperators.map(so => s" [commit=${so.allUpdatesTimeMs}/" +
                s"${so.commitTimeMs}ms rows=${so.numRowsTotal}]").mkString)
          }
          ss.catalog.dropTempView(sink)
        }
      }
    }

    gates.foreach {
      case "windows" =>
        runOne("windows", () => {
          val staged = Staging.streamSessionizeDir(spark, sfDir, 21600L)
          val schema = Staging.replaySchema(ss, staged)
          val rdr = ss.readStream.schema(schema)
          val stream = (if (mfptOverride > 0)
              rdr.option("maxFilesPerTrigger", mfptOverride) else rdr)
            .parquet(staged)
            .withColumn("tsm", timestamp_micros(expr("ts div 1000")))
            .select($"tsm", $"event_type", $"user_id", $"value")
          graft.streaming.EventStreams.hourlyEventWindows(stream)
            .drop("n_users_approx")
        })
      case "cusum" =>
        runOne("cusum", () => {
          val staged = Staging.streamSessionizeDir(spark, sfDir, 21600L)
          val schema = Staging.replaySchema(ss, staged)
          val rdr = ss.readStream.schema(schema)
          val stream = (if (mfptOverride > 0)
              rdr.option("maxFilesPerTrigger", mfptOverride) else rdr)
            .parquet(staged)
            .select($"user_id".as("key"),
              expr("ts div 1000").as("ts"),
              $"event_id".as("tie"),
              expr("CAST(CAST(COALESCE(value, 0.0) AS DECIMAL(18,4)) * 10000 AS LONG)")
                .as("v"))
            .as[graft.streaming.EventStreams.CusumEvent]
          graft.streaming.EventStreams
            .cusumExact(stream, refValueE4 = 600000L, thresholdE4 = 2000000L,
              horizonSec = 21600L).toDF()
        })
      case "ksdrift" =>
        runOne("ksdrift", () => {
          val staged = Staging.streamDocMetaDir(spark, sfDir)
          val schema = Staging.replayDocMetaSchema(ss, staged)
          val mfpt = if (mfptOverride > 0) mfptOverride else 1
          val stream = ss.readStream.schema(schema)
            .option("maxFilesPerTrigger", mfpt)
            .parquet(staged)
            .select(coalesce($"lang", lit("sentinel")).as("key"),
              expr("ts div 1000").as("ts"),
              coalesce(length($"text").cast("long"), lit(0L)).as("v"))
            .as[graft.streaming.EventStreams.ValueEvent]
          graft.streaming.EventStreams
            .valueCountsExact(stream, horizonSec = 21600L, lateSec = 2592000L).toDF()
        })
      case other => sys.error(s"unknown probe gate: $other")
    }
    spark.stop()
  }
}
