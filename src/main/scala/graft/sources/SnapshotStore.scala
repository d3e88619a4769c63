package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-committed snapshot tables — the minimal transactional-publish
  * protocol under every lake table format (Iceberg/Delta/Hudi reduce to
  * exactly this core): data files land under `data/` with unique names,
  * then ONE atomic manifest rename makes a version visible. Readers
  * resolve a manifest, never a directory listing, so
  *
  *  - a writer that crashes mid-job leaves ORPHAN files no reader ever
  *    sees (no partial snapshots),
  *  - concurrent readers keep a consistent view while a publish is in
  *    flight (old manifest stays the latest until the rename),
  *  - every historical version stays readable (time travel) until its
  *    files are vacuumed.
  *
  * The manifest is a plain text file `manifest-v{N}.txt` (one
  * `data/`-relative file path per line — deliberately dependency-free,
  * like [[graft.cli.IniConfig]]). The commit protocol is three-step:
  *
  *  1. EXCLUSIVE creation of `manifest-v{N}.lock` — the DURABLE commit
  *     right for version N: `create(…, overwrite = false)` on HDFS
  *     (namenode-atomic), NIO `Files.createFile` (O_CREAT|O_EXCL) on the
  *     local scheme — Hadoop's LOCAL create(overwrite = false) is
  *     exists-then-create and two live claimants can both pass it (caught
  *     by the r19 two-thread race spec). The lock is NEVER renamed or
  *     removed by publish (only [[vacuum]] sweeps it), so of any number
  *     of publishers that computed the same next version — no matter how
  *     their steps interleave — exactly one ever owns version N and every
  *     later claimant throws.
  *     (A commit right tied to a transient name is not enough: an
  *     earlier design keyed exclusivity to the `.tmp` name below, which
  *     the winner's rename FREES, letting a slow same-version publisher
  *     re-create it and silently rename over the committed manifest.)
  *  2. The full manifest body is written and CLOSED under
  *     `manifest-v{N}.txt.tmp`, invisible to readers.
  *  3. `rename(tmp, manifest-v{N}.txt)` — the VISIBILITY point. Rename
  *     is atomic on HDFS and POSIX, and no committed destination can
  *     exist (the lock guarantees a single publisher per version ever
  *     reaches this step), so readers switch from "version absent" to
  *     "version complete with its full body" in one step —
  *     `versions()`/`read()` can never observe an empty or partially
  *     flushed manifest.
  *
  * A publisher that dies after taking the lock leaves an orphan `.lock`
  * (plus possibly a `.tmp` and orphan data files) that blocks only
  * SAME-version publishers — loudly, with a message naming the stale
  * file; [[vacuum]] removes lock/tmp orphans along with unreferenced
  * data files.
  *
  * OBJECT-STORE caveat (the one assumption local tests cannot falsify):
  * the protocol requires atomic exclusive-create and atomic
  * destination-replacing-free rename — true on HDFS and POSIX
  * filesystems, NOT on S3A, where rename is a non-atomic copy+delete
  * and plain create is check-then-put. On such stores, front publishes
  * with an external coordinator (or single-writer discipline), or swap
  * the primitives for the store's conditional-put (If-None-Match)
  * equivalents; the three-step shape and the lock's durable-claim role
  * carry over unchanged.
  *
  * Scale posture: `publish` is one Spark write job plus an O(#files)
  * listing of its OWN output subdirectory (never the table root);
  * `read` is one manifest read (driver, O(#files) lines) and a parquet
  * scan pinned to exactly the committed files — Spark still
  * partition-prunes, column-prunes, and pushes filters into that scan.
  * Vacuum ([[vacuum]]) deletes data files no retained manifest
  * references — the GC every manifest store needs once compaction or
  * re-publish supersedes files.
  */
object SnapshotStore {

  private val ManifestRe = "manifest-v(\\d+)\\.txt".r

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed versions, ascending (empty for a fresh/nonexistent dir). */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.flatMap(s => s.getPath.getName match {
      case ManifestRe(v) => Some(v.toInt)
      case _ => None
    }).sorted
  }

  private def manifestPath(dir: String, v: Int) =
    new Path(dir, s"manifest-v$v.txt")

  private def lockPath(dir: String, v: Int) =
    new Path(dir, s"manifest-v$v.lock")

  private val LockRe = "manifest-v(\\d+)\\.lock".r

  /** Write `df` as the table's next version; returns the version number.
    * The data job writes under `data/v{N}-{uuid}/`; only after it fully
    * succeeds does the manifest rename publish it. A crash before the
    * rename leaves invisible orphans (cleaned by [[vacuum]]).
    */
  def publish(df: DataFrame, dir: String): Int = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val next = versions(spark, dir).lastOption.getOrElse(0) + 1
    // Step 1 (see class doc): the DURABLE commit right. Taken before the
    // data job so a claimant that would lose fails before writing
    // anything; never renamed or removed here, so a slow same-version
    // publisher can never re-claim N after the winner commits (r17
    // ADVICE — exclusivity tied to the transient tmp name frees at the
    // winner's rename and lets the loser rename over the manifest).
    val lock = lockPath(dir, next)
    try {
      if ("file" == Option(f.getUri.getScheme).getOrElse("")) {
        // Hadoop's LOCAL create(p, overwrite = false) is exists-then-create
        // — NOT atomic under a live two-publisher race (both claimants can
        // pass the exists check before either file lands; caught by the
        // r19 two-thread race spec, where arbitration then fell through to
        // the rename step). O_CREAT|O_EXCL via NIO is the real primitive
        // on POSIX, so the local scheme takes it directly.
        f.mkdirs(new Path(dir))
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(new java.io.File(lock.toUri.getPath).getPath))
      } else f.create(lock, false).close()
    } catch {
      // nio's FileAlreadyExistsException is an IOException subclass, so
      // one catch serves both primitives.
      case e: java.io.IOException =>
        throw new IllegalStateException(
          s"snapshot publish lost the race for version $next of $dir " +
            s"(if no publish is in flight, $lock is a crashed publisher's " +
            "orphan — run vacuum)", e)
    }
    val sub = s"v$next-${java.util.UUID.randomUUID().toString.take(8)}"
    val dataDir = new Path(new Path(dir, "data"), sub)
    df.write.mode("error").parquet(dataDir.toString)
    val files = f.listStatus(dataDir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .sorted
      .map(n => s"$sub/$n")
    // Steps 2+3: body under the tmp name, then the atomic visibility
    // rename. The destination cannot exist — the lock admitted exactly
    // one publisher for this version. The tmp create may overwrite:
    // ownership is decided by the lock alone, so any leftover tmp here
    // is a dead claimant's debris this publisher is entitled to replace.
    val tmp = new Path(dir, s"manifest-v$next.txt.tmp")
    val out = f.create(tmp, true)
    try out.write(files.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, manifestPath(dir, next)))
      throw new IllegalStateException(
        s"snapshot publish could not rename $tmp to its manifest name")
    next
  }

  /** Read a committed version (latest by default) — exactly the
    * manifest's files, never a directory listing, so orphans and
    * in-flight writes are invisible.
    */
  def read(spark: SparkSession, dir: String, version: Option[Int] = None): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not committed under $dir (have $vs)")
    val f = fs(spark, dir)
    val in = f.open(manifestPath(dir, v))
    val files =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    require(files.nonEmpty, s"version $v of $dir committed no files")
    spark.read.parquet(files.map(rel => new Path(new Path(dir, "data"), rel).toString): _*)
  }

  /** SEMANTIC DIFF between two committed versions — the "what changed
    * between yesterday's corpus and today's" question every snapshot
    * consumer asks before retraining: [[graft.operators.MergeOps
    * .snapshotDiff]]'s added/removed/changed/unchanged classification
    * with the two sides resolved through the manifest layer (time travel
    * makes version-vs-version diff a one-liner — the point of keeping
    * history). Requires the versions to share a schema; when schemas may
    * have moved, run [[schemaDrift]] first.
    *
    * Output: (keyCols…, status STRING).
    */
  def diff(spark: SparkSession, dir: String, versionA: Int, versionB: Int,
      keyCols: Seq[String]): DataFrame =
    graft.operators.MergeOps.snapshotDiff(
      read(spark, dir, Some(versionA)), read(spark, dir, Some(versionB)),
      keyCols)

  /** SCHEMA drift between two committed versions: one row per column
    * name present in either version with status `added` / `removed` /
    * `retyped` / `unchanged` and both type strings (NULL where absent).
    * The structural companion to [[diff]] — schema evolution between
    * versions is legal (each version's files are self-describing), and
    * this is the report a consumer checks before assuming yesterday's
    * reader still binds.
    *
    * Output: (column, status, type_a, type_b), driver-bounded (schema
    * width), returned as a DataFrame so it gates/joins like everything
    * else.
    */
  def schemaDrift(spark: SparkSession, dir: String,
      versionA: Int, versionB: Int): DataFrame = {
    import spark.implicits._
    def types(v: Int): Map[String, String] =
      read(spark, dir, Some(v)).schema.fields
        .map(f => f.name -> f.dataType.sql).toMap
    val ta = types(versionA)
    val tb = types(versionB)
    (ta.keySet ++ tb.keySet).toSeq.sorted.map { c =>
      val (sa, sb) = (ta.get(c), tb.get(c))
      val status = (sa, sb) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(x), Some(y)) if x == y => "unchanged"
        case _ => "retyped"
      }
      (c, status, sa, sb)
    }.toDF("column", "status", "type_a", "type_b")
  }

  /** COMPACTION — the small-files cure every manifest store eventually
    * needs: a table that accretes versions from many small publishes (or
    * a publish whose job ran at high parallelism over little data) pays
    * per-file open/footer costs on every read. Compact rewrites the
    * LATEST version's rows into ~`targetFileBytes` files and publishes
    * the result as a NEW version — readers are never disturbed (the old
    * version stays readable until [[vacuum]]), and the commit rides the
    * same lock+tmp+rename protocol as any publish. Returns the new
    * version number, or None when the latest version is already at or
    * under the target file count (never rewrite what is already compact).
    *
    * The target file count comes from the manifest's own referenced-file
    * byte total (driver-side, O(#files) `getFileStatus` calls — the same
    * order as reading the manifest), so no data pass is spent estimating.
    * The rewrite itself is one shuffle of the version's rows, the price
    * of size-balanced output files:
    *
    *  - `sortCols` empty: round-robin `repartition(n)` — balanced sizes,
    *    no ordering claim.
    *  - `sortCols` given: `repartitionByRange(n, cols)` +
    *    `sortWithinPartitions` — the CLUSTERED rewrite. Each output
    *    file covers a disjoint range of the sort key, so parquet
    *    min/max (row-group and file) statistics prune reads on
    *    key-predicate scans — at 100 TB this, not the file-count cure,
    *    is what compaction is usually FOR. (Range boundaries come from
    *    Spark's sampling pass over the child — one extra read of the
    *    version, the standard range-partitioning cost.) A no-op return
    *    still means "file count already at target": re-clustering an
    *    already-compact table is a caller decision, made explicit by
    *    lowering `targetFileBytes`.
    */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      sortCols: Seq[String] = Nil): Option[Int] = {
    require(targetFileBytes >= 1L, s"bad targetFileBytes $targetFileBytes")
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    val f = fs(spark, dir)
    val v = vs.last
    val in = f.open(manifestPath(dir, v))
    val files =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    val dataRoot = new Path(dir, "data")
    val totalBytes = files.map(rel =>
      f.getFileStatus(new Path(dataRoot, rel)).getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    if (files.length <= nFiles) return None
    val rows = read(spark, dir, Some(v))
    val rewritten =
      if (sortCols.isEmpty) rows.repartition(nFiles)
      else {
        val sc = sortCols.map(org.apache.spark.sql.functions.col)
        rows.repartitionByRange(nFiles, sc: _*).sortWithinPartitions(sc: _*)
      }
    Some(publish(rewritten, dir))
  }

  /** Delete data files referenced by NO retained manifest (keep the last
    * `keepVersions`) plus the dropped manifests themselves. Returns the
    * number of data files deleted. Orphans from crashed publishes go too
    * — data files, stale `manifest-v*.txt.tmp` markers, AND
    * `manifest-v*.lock` markers of versions that never committed (a
    * retained version's lock stays with its manifest). Vacuum already
    * requires no publish in flight: an in-flight publisher's data files
    * are referenced by no manifest and would be swept regardless — and
    * sweeping its lock would hand away its commit right.
    */
  def vacuum(spark: SparkSession, dir: String, keepVersions: Int = 1): Int = {
    require(keepVersions >= 1, s"must keep >= 1 version, got $keepVersions")
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    val keep = vs.takeRight(keepVersions).toSet
    val referenced = vs.filter(keep).flatMap { v =>
      val in = f.open(manifestPath(dir, v))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    }.toSet
    // Qualify BOTH sides before relativizing: listFiles returns
    // scheme-qualified paths and URI.relativize refuses cross-scheme
    // pairs (returning the input whole — which would mark every file
    // unreferenced and delete the live version).
    val dataRoot = f.makeQualified(new Path(dir, "data"))
    var deleted = 0
    if (f.exists(dataRoot)) {
      val it = f.listFiles(dataRoot, true)
      val toDelete = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile) {
          val rel = dataRoot.toUri
            .relativize(f.makeQualified(st.getPath).toUri).getPath
          if (!referenced.contains(rel)) toDelete += st.getPath
        }
      }
      toDelete.foreach { p => if (f.delete(p, false)) deleted += 1 }
    }
    vs.filterNot(keep).foreach { v =>
      f.delete(manifestPath(dir, v), false)
      f.delete(lockPath(dir, v), false)
    }
    if (f.exists(new Path(dir)))
      f.listStatus(new Path(dir)).toSeq
        .filter { st =>
          st.isFile && (st.getPath.getName match {
            case n if n.startsWith("manifest-v") && n.endsWith(".txt.tmp") => true
            // Crashed-publisher lock with no committed manifest; retained
            // versions' locks stay (they are the durable claim on N).
            case LockRe(v) => !keep.contains(v.toInt)
            case _ => false
          })
        }
        .foreach(st => f.delete(st.getPath, false))
    deleted
  }
}
