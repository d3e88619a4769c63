package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}

/** Benchmark main — runs every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * emits one machine-readable JSON line (stdout + BENCH.json beside the cwd).
  *
  * Each query is materialized through the noop sink, NOT `.count()`:
  * under count, Catalyst's EliminateSorts removes final ORDER BYs and column
  * pruning deletes projection work, so scalar/string pipelines would never
  * execute and the numbers would measure scan+count only. The noop sink
  * consumes every row of every column downstream of the full plan.
  *
  * Batch queries run SPARK_GRAFT_REPS times (default 3) and stream queries
  * SPARK_GRAFT_STREAM_REPS times (default 2 — r19 VERDICT item 2: the 36
  * staged-replay stream gates were the sweep's most expensive block, their
  * three draws historically agree within noise, and the third stream pass is
  * what the r19 driver timeout killed). Per-query stats report the MEDIAN of
  * the draws taken (plus the min, as `queries_min`): single-run numbers on a
  * shared 32-way box showed 2× phantom regressions round-to-round, and the
  * median ignores one bad draw. Reps are interleaved round-robin across the
  * query list so one noisy wall-clock window cannot poison all of a query's
  * draws (the grouped-reps failure mode seen in round 6). `value` is the sum
  * of medians.
  *
  * SURVIVABILITY (r19 VERDICT item 1 — the r19 driver bench was SIGTERM'd
  * mid-stream-pass and recorded `rc 124, parsed: null`, i.e. the round
  * shipped NO driver-side perf number despite 40 minutes of measurement):
  *  - SPARK_GRAFT_BUDGET_SEC (default 1500) is a wall-clock budget. Once
  *    elapsed time crosses it, no further queries START; the run finalizes
  *    from the draws already taken, with `"budget_truncated":true` and a
  *    per-query `queries_reps_completed` map in BENCH.json. Truncated
  *    queries report the stats of the draws they DID take — null stays
  *    reserved for real failures, so breakage still can't masquerade as
  *    speed.
  *  - After EVERY rep pass AND at every SentinelStride boundary inside a
  *    pass (r20 ADVICE: a kill during the first multi-minute pass used to
  *    leave no record at all) the full record is written to BENCH.json and
  *    the stdout summary line is cached in-process with `"partial":true`.
  *  - A JVM shutdown hook prints the latest cached line: a SIGTERM'd run
  *    emits the last checkpoint's parseable summary as its final stdout
  *    instead of nothing. On normal completion the final `"partial":false`
  *    line is printed FIRST and the hook disarmed after (r20 ADVICE: the
  *    old order had a window where a SIGTERM between disarm and println
  *    emitted nothing; a duplicated identical line is harmless to a tail
  *    parse, a missing one is not).
  *
  * Pass order interleaves the stream group into the batch reps —
  * batch-pass-1, stream-pass-1, batch-pass-2, stream-pass-2, batch-pass-3
  * (r20 VERDICT item 3: the old all-batch-then-all-stream order meant a
  * budget hit mid-batch-pass-2 left all 36 stream gates with ZERO draws;
  * min/median semantics already tolerate unequal rep counts, so a truncated
  * run now still carries ≥1 draw per stream gate). Within each group the
  * round-robin interleaving is preserved, and each group still runs in its
  * own passes so the staged-replay protocol's I/O stays confined to the
  * stream windows (r18 VERDICT item 2).
  *
  * A fixed SENTINEL (a constant tiny plan, identical every round) runs at
  * each rep-pass head AND every `SentinelStride` queries inside the pass;
  * the full (pass, offset, seconds) trace lands in BENCH.json, so a noisy
  * sweep region is identified by its own record instead of argued from
  * cross-round deltas.
  *
  * STDOUT DISCIPLINE (r20 VERDICT item 1 — two consecutive rounds of
  * `parsed: null`): the driver parses a ~2000-char stdout TAIL, so the
  * metric line must fit that window in EVERY terminal state. r20's line
  * overflowed to ~2,530 chars because the `not_run` array carried all 36
  * unreached stream-gate names (701 chars) after a budget hit. The stdout
  * line now carries: the summary fields, the 18-query BASELINE.md subset
  * (medians AND minima — the cross-round comparison contract), and
  * `failed`/`not_run` as COUNTS plus a first-3 `_head` sample. The full
  * name arrays, the complete per-query maps, the raw rep draws and the
  * sentinel trace all stay in BENCH.json. BenchSubsetSpec constructs the
  * worst-case line (budget hit, all streams unreached, failures present,
  * 5-digit values everywhere) and pins its length ≤ MaxStdoutLineChars.
  */
object Bench {
  /** The 18-query BASELINE.md subset — the cross-round comparison contract
    * (bench_vs_baseline = subset sum / 25.89 s round-2 anchor). Public so
    * BenchSubsetSpec can pin every member against `SparkEntry.queries` —
    * a rename otherwise shrinks the sum silently (r12 ADVICE).
    */
  val baselineSubset: Set[String] = Set(
    "q1_pricing_summary", "q3_top_unshipped", "q5_region_revenue",
    "q6_revenue_change", "q_case_buckets", "q_conform_cast",
    "q_derived_subquery", "q_distinct", "q_filter_predicates",
    "q_merge_upsert", "q_orderby_limit", "q_outer_joins",
    "q_scalar_datetime", "q_scalar_string", "q_semi_anti_join",
    "q_set_ops", "q_string_agg", "q_window_funcs")

  /** Hard pin for the stdout metric line, asserted by BenchSubsetSpec
    * against the worst-case line [[stdoutLine]] can construct. The driver's
    * tail window is ~2000 chars; 1800 leaves slack for a stray trailing
    * newline or log fragment.
    */
  val MaxStdoutLineChars: Int = 1800

  /** How many failed/not-run names the stdout line samples (the counts are
    * always exact; the full lists live in BENCH.json).
    */
  val HeadSample: Int = 3

  private def nameArray(names: Seq[String]): String =
    names.map("\"" + _ + "\"").mkString("[", ",", "]")

  /** The driver-facing stdout summary line, built from pre-rendered parts.
    * Pure so BenchSubsetSpec can construct the worst case and pin its
    * length. `queriesJson`/`queriesMinJson` must be the SUBSET-ONLY maps;
    * failed/notRun arrive as full name lists and are emitted as counts plus
    * a first-[[HeadSample]] sample.
    */
  def stdoutLine(summaryJson: String, queriesJson: String,
      queriesMinJson: String, failed: Seq[String], notRun: Seq[String],
      sfDir: String): String =
    f"""{"metric":"total",$summaryJson,""" +
      f""""queries":$queriesJson,"queries_min":$queriesMinJson,""" +
      f""""failed_n":${failed.length},"failed_head":${nameArray(failed.take(HeadSample))},""" +
      f""""not_run_n":${notRun.length},"not_run_head":${nameArray(notRun.take(HeadSample))},""" +
      f""""sf":"$sfDir"}"""

  /** The shared summary fields (everything scalar), used verbatim by both
    * the stdout line and the BENCH.json record. Pure for the spec.
    */
  def summaryJson(total: Double, reps: Int, streamReps: Int, nQueries: Int,
      nMeasured: Int, partial: Boolean, budgetTruncated: Boolean,
      budgetSec: Double, elapsedSec: Double, subsetTotalJson: String,
      subsetTotalMedJson: String, subsetComplete: Boolean, subsetMinReps: Int,
      subsetNormJson: String, sentinelJson: String): String =
    f""""value":$total%.3f,"unit":"sec","reps":$reps,"stream_reps":$streamReps,""" +
      f""""n_queries":$nQueries,"n_measured":$nMeasured,""" +
      f""""partial":$partial,"budget_truncated":$budgetTruncated,""" +
      f""""budget_sec":$budgetSec%.0f,"elapsed_sec":$elapsedSec%.1f,""" +
      f""""subset18_total":$subsetTotalJson,""" +
      f""""subset18_total_median":$subsetTotalMedJson,""" +
      f""""subset18_complete":$subsetComplete,""" +
      f""""subset18_min_reps":$subsetMinReps,""" +
      f""""subset18_norm":$subsetNormJson,""" +
      f""""sentinel":$sentinelJson"""

  def main(args: Array[String]): Unit = {
    val startNanos = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - startNanos) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the driver parses the stdout TAIL, and two benign
    // WindowExec WARN lines (k-row bounded windows, see PlanShapeSpec) were
    // the only non-metric content still landing after the metric line —
    // every BENCH since r8 recorded parsed:null for it. The metric JSON must
    // be the final stdout content (r12 VERDICT item 1).
    spark.sparkContext.setLogLevel("ERROR")
    // Deterministic query order (Map iteration order is arbitrary and puts
    // JVM/codegen warm-up cost on whichever query happens to run first).
    // SPARK_GRAFT_ONLY (comma-separated names) restricts the run — an
    // iteration convenience; the driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // One warm-up action so JIT/codegen/parquet-footer costs are not billed
    // to the first measured query.
    SparkEntry.queries(names.head)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val streamReps = sys.env.getOrElse("SPARK_GRAFT_STREAM_REPS", "2").toInt
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BUDGET_SEC", "1500").toDouble
    def expectedReps(name: String): Int =
      if (name.startsWith("q_stream_")) streamReps else reps
    // Reps are INTERLEAVED round-robin (full query list `reps` times), not
    // grouped per query: grouped reps put one query's three draws in the
    // same ~30 s wall-clock window, so sustained co-tenant noise poisons
    // all three and the median keeps it (round 6 recorded q_dedup_simhash
    // at 8.72 s vs 0.86 s re-measured). Spreading a query's draws across
    // the whole run makes a correlated-noise window hit at most one draw
    // per query. A query failing ANY rep records null — breakage can't
    // masquerade as speed.
    val timesByName = scala.collection.mutable.Map(names.map(_ -> Vector.empty[Double]): _*)
    val failedOnce = scala.collection.mutable.Set.empty[String]
    // The contention sentinel: a constant plan with one exchange, no table
    // input — identical across rounds, so its wall-clock measures the box,
    // not the code. Failures are swallowed like a query's (the sentinel is
    // diagnostics — it must never be the reason a multi-minute sweep dies
    // with no record).
    def sentinelOnce(): Option[Double] = try {
      val t0 = System.nanoTime()
      spark.range(0, 10000000L, 1, 32)
        .selectExpr("id % 97 AS k", "id")
        .groupBy("k").sum("id")
        .write.format("noop").mode("overwrite").save()
      Some((System.nanoTime() - t0) / 1e9)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] sentinel failed: ${e.getMessage}")
      None
    }
    sentinelOnce() // warm-up draw, not recorded
    // The sentinel TRACE (r18 VERDICT item 2): one draw at each pass head
    // PLUS one every `SentinelStride` queries inside the pass, each recorded
    // as (pass, offset, seconds). A 240-gate pass runs for minutes, so a
    // single head-of-pass draw cannot vouch for the box minutes later; the
    // trace makes each region of the sweep carry its own noise tag
    // mechanically.
    val SentinelStride = 40
    var sentinelTrace = Vector.empty[(Int, Int, Double)]
    def tracedSentinel(pass: Int, offset: Int): Unit =
      sentinelOnce().foreach(t => sentinelTrace :+= ((pass, offset, t)))

    // ---- JSON emission, callable at ANY point in the sweep ----------------
    // LOWER median: identical to the classic pick for odd counts, but for
    // an even draw count it takes the better middle draw — with
    // SPARK_GRAFT_STREAM_REPS = 2 the upper pick would ALWAYS report the
    // worse of a stream gate's two draws, and the first stream draw
    // carries the one-time staging cost by design (the Staging.memo
    // convention: reps measure the probe, not the build).
    def median(ts: Seq[Double]): Double = ts.sorted.apply((ts.length - 1) / 2)
    // null strictly for FAILED queries; a budget-truncated query reports the
    // stats of the draws it did take (its confidence is readable from
    // queries_reps_completed in BENCH.json).
    def jmap(entries: Seq[(String, Vector[Double])], stat: Vector[Double] => Double): String =
      entries.map { case (k, ts) =>
        "\"" + k + "\":" + (if (ts.nonEmpty && !failedOnce(k)) f"${stat(ts)}%.3f" else "null")
      }.mkString("{", ",", "}")
    /** Builds both JSON records from current state, writes BENCH.json, and
      * caches the stdout line. Returns the stdout line.
      */
    def emit(partial: Boolean, budgetTruncated: Boolean): String = {
      val sentinelTs = sentinelTrace.map(_._3)
      val results = names.map(n => (n, if (failedOnce(n)) Vector.empty[Double] else timesByName(n)))
      val measured = results.filter { case (k, ts) => ts.nonEmpty && !failedOnce(k) }
      val failedNames = results.collect { case (k, _) if failedOnce(k) => k }
      val notRunNames = results.collect { case (k, ts) if ts.isEmpty && !failedOnce(k) => k }
      val total = measured.map { case (_, ts) => median(ts) }.sum
      val subsetRes = results.filter(r => baselineSubset(r._1))
      // The contract number is the sum of per-query MINIMA, not medians: the
      // r12 driver medians were contention artifacts (q_correlation 11.77 s
      // median vs 1.07 s min on an idle box), and the minimum is the draw
      // least polluted by co-tenants — the contention-immune estimator the
      // cross-round record should key on (r12 VERDICT item 3; convention
      // documented in BASELINE.md). The median sum stays as a secondary field.
      //
      // Completeness semantics (r20): the r12 hazard is a MISSING member
      // silently shrinking the sum and reading as an improvement. Fewer
      // draws per member cannot shrink a min-sum (a min over fewer draws is
      // ≥ the min over more), so under budget truncation the sum stays
      // trustworthy as long as every member contributed ≥1 draw and none
      // failed. subset18_total is therefore non-null on ≥1 draw each;
      // subset18_complete stays the strict full-reps flag, and
      // subset18_min_reps records the weakest member's draw count.
      val subsetAllPresent = baselineSubset
        .forall(n => subsetRes.exists(r => r._1 == n && r._2.nonEmpty && !failedOnce(n)))
      val subsetComplete = baselineSubset
        .forall(n => subsetRes.exists(r => r._1 == n && r._2.length == expectedReps(n)))
      val subsetMinReps =
        if (subsetAllPresent) subsetRes.map(_._2.length).min else 0
      val subsetTotal = subsetRes.collect { case (_, ts) if ts.nonEmpty => ts.min }.sum
      val subsetTotalMed = subsetRes.collect { case (_, ts) if ts.nonEmpty => median(ts) }.sum
      val subsetTotalJson = if (subsetAllPresent) f"$subsetTotal%.3f" else "null"
      val subsetTotalMedJson = if (subsetAllPresent) f"$subsetTotalMed%.3f" else "null"
      val sentinelJson =
        if (sentinelTs.isEmpty) "null"
        else f"""{"median":${median(sentinelTs)}%.3f,"min":${sentinelTs.min}%.3f}"""
      // Sentinel-NORMALIZED subset ratio (r17 VERDICT item 7): subset minima
      // divided by the sentinel minimum, so cross-round comparisons separate
      // box contention from plan movement mechanically. Null whenever either
      // input is untrustworthy (missing subset member / no sentinel draws).
      val subsetNormJson =
        if (subsetAllPresent && sentinelTs.nonEmpty && sentinelTs.min > 0)
          f"${subsetTotal / sentinelTs.min}%.2f"
        else "null"
      val common = summaryJson(total, reps, streamReps, names.length,
        measured.length, partial, budgetTruncated, budgetSec, elapsedSec,
        subsetTotalJson, subsetTotalMedJson, subsetComplete, subsetMinReps,
        subsetNormJson, sentinelJson)
      // Stdout carries the subset maps + compact failed/not_run only (see
      // the stdout-discipline note); everything else lives in BENCH.json.
      val subsetSorted = subsetRes.sortBy(_._1)
      val stdoutJson = stdoutLine(common, jmap(subsetSorted, median),
        jmap(subsetSorted, _.min), failedNames, notRunNames, sfDir)
      // Raw per-draw record: every query's individual rep times plus the
      // full sentinel trace [(pass, offset, sec)…] — with the raw draws and
      // their nearest noise tags in the record, a drifted median is
      // attributable (or not) from BENCH.json alone.
      val repsJson = results.map { case (k, ts) =>
        "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val repsCompletedJson = results.map { case (k, ts) =>
        "\"" + k + "\":" + ts.length
      }.mkString("{", ",", "}")
      val traceJson = sentinelTrace
        .map { case (p, o, t) => f"[$p,$o,$t%.3f]" }.mkString("[", ",", "]")
      val fileJson =
        f"""{"metric":"total",$common,""" +
          f""""sentinel_reps":${sentinelTrace.map(x => f"${x._3}%.3f").mkString("[", ",", "]")},""" +
          f""""sentinel_trace":$traceJson,""" +
          f""""queries":${jmap(results, median)},"queries_min":${jmap(results, _.min)},""" +
          f""""queries_reps":$repsJson,""" +
          f""""queries_reps_completed":$repsCompletedJson,""" +
          f""""failed":${nameArray(failedNames)},"not_run":${nameArray(notRunNames)},"sf":"$sfDir"}"""
      Files.writeString(Paths.get("BENCH.json"), fileJson + "\n")
      stdoutJson
    }

    // The crash-safe tail: at every checkpoint the latest partial summary
    // is cached here, and the shutdown hook prints it if the JVM dies before
    // normal completion (SIGTERM from the driver's timeout, OOM-killer
    // sibling, anything). The hook writes to the same inherited stdout fd
    // the final line would use, so the driver's tail parse sees a well-formed
    // record with "partial":true instead of nothing (r19: rc 124/parsed null).
    val lastPartialLine = new AtomicReference[String]("")
    val hookArmed = new AtomicBoolean(true)
    sys.addShutdownHook {
      if (hookArmed.get) {
        val line = lastPartialLine.get
        if (line.nonEmpty) { println(line); System.out.flush() }
      }
    }

    // Stream gates (the 36 staged-replay q_stream_* monitors) run in their
    // OWN rep passes (r18 VERDICT item 2): their fixed micro-batch protocol
    // cost (staging reads, checkpoint dirs, state-store lifecycle) is the
    // sweep's heaviest I/O, and isolating it keeps any cross-talk confined
    // to the stream windows. The passes INTERLEAVE with the batch passes
    // (batch-1, stream-1, batch-2, stream-2, batch-3, …) so a budget
    // truncation at any point after the first two passes leaves ≥1 draw for
    // every gate of both groups (r20: the budget fired before the
    // all-batch-then-all-stream order ever reached the stream group — 0 of
    // 36 stream gates measured driver-side).
    val (streamNames, batchNames) = names.partition(_.startsWith("q_stream_"))
    val passPlan: Seq[Seq[String]] =
      (0 until math.max(reps, streamReps)).flatMap { i =>
        (if (i < reps && batchNames.nonEmpty) Seq(batchNames) else Nil) ++
          (if (i < streamReps && streamNames.nonEmpty) Seq(streamNames) else Nil)
      }
    var pass = 0
    var budgetHit = false
    for (group <- passPlan if !budgetHit) {
      var offset = 0
      tracedSentinel(pass, offset)
      val it = group.iterator
      while (it.hasNext && !budgetHit) {
        // Budget check BEFORE each query starts: a crossed budget stops new
        // work immediately (not just at pass boundaries — the r19 stream
        // passes alone ran >10 min, far past any useful boundary check),
        // finalizing from the draws already taken.
        if (elapsedSec > budgetSec) {
          budgetHit = true
        } else {
          val name = it.next()
          if (offset > 0 && offset % SentinelStride == 0) {
            tracedSentinel(pass, offset)
            // Mid-pass crash-safe checkpoint (r20 ADVICE): a kill during the
            // first multi-minute pass must still leave a BENCH.json and a
            // cached stdout line from minutes in, not nothing.
            lastPartialLine.set(emit(partial = true, budgetTruncated = false))
          }
          val t0 = System.nanoTime()
          try {
            SparkEntry.queries(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            timesByName(name) :+= (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            failedOnce += name
          }
          offset += 1
        }
      }
      pass += 1
      // Crash-safe checkpoint: full BENCH.json + cached partial stdout line
      // after every pass, so a kill at any later point still has the last
      // completed pass's record.
      lastPartialLine.set(emit(partial = true, budgetTruncated = budgetHit))
    }
    // Normal completion. Stop Spark BEFORE the metric line: spark.stop() can
    // log shutdown lines, and the metric JSON must be the very last stdout
    // content for the driver's tail parse (r12 VERDICT item 1). The hook
    // stays ARMED through spark.stop() AND through the final println with
    // the final line cached: stop() takes seconds, and a SIGTERM landing
    // anywhere in that window would otherwise print nothing (r20 ADVICE —
    // the old code disarmed BEFORE printing; a duplicate identical final
    // line from the hook is harmless to the driver's tail parse).
    val finalLine = emit(partial = false, budgetTruncated = budgetHit)
    lastPartialLine.set(finalLine)
    spark.stop()
    println(finalLine)
    System.out.flush()
    hookArmed.set(false)
  }
}
