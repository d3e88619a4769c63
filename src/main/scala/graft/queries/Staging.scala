package graft.queries

import java.nio.file.{Files, Paths}

/** Shared tmpdir staging for fixture-backed queries (CSV/JSON round-trips,
  * file-stream sources): one materialization per (kind, sfDir, table) per
  * JVM under a pid-unique path, recursively deleted at JVM exit. The pid
  * component keeps concurrent harness runs from racing on a shared tmpdir.
  */
private[queries] object Staging {

  private val staged = scala.collection.concurrent.TrieMap.empty[(String, String, String), String]
  private val sinkIds = new java.util.concurrent.atomic.AtomicLong()
  // previous memory sink PER SESSION — dropping is catalog-scoped, so a
  // global "last" would no-op across sessions and leak the other's result
  private var lastStreamSink = Map.empty[org.apache.spark.sql.SparkSession, String]

  /** Stage once per (kind, dir, table); `write(path)` materializes on first
    * use. Returns the staged path. First-use creation is serialized (two
    * concurrent first callers would otherwise both run `write` against the
    * same deterministic path); the cleanup hook registers BEFORE the write
    * so an interrupted materialization cannot leak a partial directory.
    */
  def dir(kind: String, sfDir: String, table: String)(write: String => Unit): String = {
    val key = (kind, sfDir, table)
    staged.getOrElse(key, synchronized {
      staged.getOrElseUpdate(key, {
        val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_${kind}_" +
          s"${ProcessHandle.current().pid()}_${tag}_$table"
        cleanupOnExit(p)
        write(p)
        p
      })
    })
  }

  /** Events fixture staged as a DIRECTORY (file-stream sources reject bare
    * files).
    */
  def streamEventsDir(sfDir: String): String =
    dir("stream", sfDir, "events") { p =>
      Files.createDirectories(Paths.get(p))
      Files.copy(Paths.get(s"$sfDir/events.parquet"), Paths.get(p, "events.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }

  /** Unique memory-sink name; the calling session's PREVIOUS streaming sink
    * is dropped so each session holds at most one materialized result.
    */
  def nextStreamSink(spark: org.apache.spark.sql.SparkSession): String = synchronized {
    lastStreamSink.get(spark).foreach(spark.catalog.dropTempView(_))
    val name = s"graft_stream_windows_${sinkIds.incrementAndGet()}"
    lastStreamSink += spark -> name
    name
  }

  private def cleanupOnExit(path: String): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(path))
    }))
}
