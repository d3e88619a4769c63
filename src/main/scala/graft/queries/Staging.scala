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
  @volatile private var lastStreamSink: Option[String] = None

  /** Stage once per (kind, dir, table); `write(path)` materializes on first
    * use. Returns the staged path.
    */
  def dir(kind: String, sfDir: String, table: String)(write: String => Unit): String =
    staged.getOrElseUpdate((kind, sfDir, table), {
      val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_${kind}_" +
        s"${ProcessHandle.current().pid()}_${tag}_$table"
      write(p)
      cleanupOnExit(p)
      p
    })

  /** Events fixture staged as a DIRECTORY (file-stream sources reject bare
    * files).
    */
  def streamEventsDir(sfDir: String): String =
    dir("stream", sfDir, "events") { p =>
      Files.createDirectories(Paths.get(p))
      Files.copy(Paths.get(s"$sfDir/events.parquet"), Paths.get(p, "events.parquet"))
      ()
    }

  /** Unique memory-sink name; the PREVIOUS streaming sink's temp view is
    * dropped so repeated invocations in one session hold at most one
    * materialized result.
    */
  def nextStreamSink(spark: org.apache.spark.sql.SparkSession): String = {
    lastStreamSink.foreach(spark.catalog.dropTempView(_))
    val name = s"graft_stream_windows_${sinkIds.incrementAndGet()}"
    lastStreamSink = Some(name)
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
