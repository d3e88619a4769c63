package graft.cli

import org.apache.spark.sql.SparkSession
import graft.Loader
import graft.meta.JdbcPgCatalog
import graft.sink.JdbcConnectionFactory

/** CLI entry point — the reference's `main.py:6-73` re-expressed, fixing its
  * catalogued defects: `--partition_cols` is a real column list (the
  * reference declares it `type=int`, `/root/reference/main.py:38-42`), and
  * repeated `--source_opt k=v` flags actually reach the source (the
  * reference's `--source_arg` append-list splat only works empty,
  * `/root/reference/main.py:47-53,66`).
  *
  * Credentials: `--pg_url` is a JDBC URL; user/password come from
  * `--pg_user`/`--pg_password` or the PGUSER/PGPASSWORD environment (never
  * required on the command line, where they'd leak into process listings).
  */
object Main {

  final case class CliArgs(
      load: Loader.LoadConfig,
      pgUrl: String,
      pgUser: String,
      pgPassword: String)

  private val usage =
    """usage: graft.cli.Main --source <csv|parquet|json|jdbc> --path <path>
      |         --target_pg_table <schema.table> --pg_url <jdbc:postgresql://...>
      |         [--pg_user u] [--pg_password p]        (or PGUSER/PGPASSWORD env)
      |         [--batch_size 1000] [--parallelism 1]
      |         [--partition_cols c1,c2] [--cols_not_for_update c1,c2]
      |         [--max_rejects n] [--source_opt k=v]...""".stripMargin

  /** Pure argument parser, exposed for tests. */
  def parse(args: Seq[String], env: Map[String, String] = sys.env): Either[String, CliArgs] = {
    val flags = scala.collection.mutable.Map.empty[String, String]
    val sourceOpts = scala.collection.mutable.Map.empty[String, String]
    var rest = args.toList
    while (rest.nonEmpty) rest match {
      case "--source_opt" :: kv :: tail =>
        kv.split("=", 2) match {
          case Array(k, v) => sourceOpts += k -> v
          case _           => return Left(s"--source_opt expects k=v, got '$kv'\n$usage")
        }
        rest = tail
      // A following `--flag` is NOT a value: `--pg_user --pg_password` would
      // silently set user to the literal '--pg_password' and then source the
      // password from env — a misconfiguration that must be a usage error.
      case flag :: value :: tail if flag.startsWith("--") && !value.startsWith("--") =>
        flags += flag.drop(2) -> value
        rest = tail
      case flag :: _ if flag.startsWith("--") =>
        return Left(s"$flag expects a value\n$usage")
      case bad :: _ => return Left(s"unexpected argument '$bad'\n$usage")
      case Nil      => ()
    }
    def required(k: String): Either[String, String] =
      flags.get(k).toRight(s"missing required --$k\n$usage")
    // Malformed numbers are usage errors like every other bad argument —
    // never an escaping NumberFormatException.
    def numeric[A](k: String, default: A)(parse: String => A): Either[String, A] =
      flags.get(k) match {
        case None => Right(default)
        case Some(v) =>
          try Right(parse(v))
          catch { case _: NumberFormatException =>
            Left(s"--$k expects a number, got '$v'\n$usage")
          }
      }
    for {
      source <- required("source")
      path <- required("path")
      table <- required("target_pg_table")
      url <- required("pg_url")
      user <- flags.get("pg_user").orElse(env.get("PGUSER"))
        .toRight(s"missing --pg_user (or PGUSER env)\n$usage")
      password <- flags.get("pg_password").orElse(env.get("PGPASSWORD"))
        .toRight(s"missing --pg_password (or PGPASSWORD env)\n$usage")
      batchSize <- numeric("batch_size", 1000)(_.toInt)
      parallelism <- numeric("parallelism", 1)(_.toInt)
      maxRejects <- numeric[Option[Long]]("max_rejects", None)(v => Some(v.toLong))
    } yield CliArgs(
      Loader.LoadConfig(
        source = source,
        path = path,
        targetTable = table,
        sourceOptions = sourceOpts.toMap,
        batchSize = batchSize,
        parallelism = parallelism,
        partitionCols = flags.get("partition_cols").toSeq.flatMap(_.split(',')).filter(_.nonEmpty),
        colsNotForUpdate = flags.get("cols_not_for_update").toSeq.flatMap(_.split(',')).filter(_.nonEmpty),
        maxRejects = maxRejects),
      url, user, password)
  }

  def main(args: Array[String]): Unit = parse(args.toIndexedSeq) match {
    case Left(err) =>
      System.err.println(err)
      sys.exit(2)
    case Right(cli) =>
      val spark = SparkSession.builder()
        .appName("Postgres Loader") // reference main.py:13-14
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val factory = JdbcConnectionFactory(cli.pgUrl, cli.pgUser, cli.pgPassword)
        val catalog = new JdbcPgCatalog(() => factory.rawConnection())
        val stats = Loader.loadPostgres(spark, cli.load, catalog, factory)
        println(stats.report)
        if (stats.rejected > 0) sys.exit(1)
      } finally spark.stop()
  }
}
