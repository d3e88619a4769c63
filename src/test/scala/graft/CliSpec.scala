package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cli.Main

/** CLI argument wiring (reference main.py:17-55), including the two defects
  * fixed by design: partition_cols is a real column list and repeated
  * source options actually arrive.
  */
class CliSpec extends AnyFunSuite {

  private val base = Seq(
    "--source", "csv", "--path", "/data/in",
    "--target_pg_table", "sales.orders", "--pg_url", "jdbc:postgresql://h/db")

  test("full flag set parses into LoadConfig + credentials") {
    val got = Main.parse(base ++ Seq(
      "--pg_user", "u", "--pg_password", "p",
      "--batch_size", "500", "--parallelism", "4",
      "--partition_cols", "region,day", "--cols_not_for_update", "created_at",
      "--max_rejects", "9",
      "--source_opt", "header=true", "--source_opt", "delimiter=|"), Map.empty)
    val cli = got.toOption.get
    assert(cli.load.source == "csv" && cli.load.path == "/data/in")
    assert(cli.load.schema == "sales" && cli.load.table == "orders")
    assert(cli.load.batchSize == 500 && cli.load.parallelism == 4)
    assert(cli.load.partitionCols == Seq("region", "day"))
    assert(cli.load.colsNotForUpdate == Seq("created_at"))
    assert(cli.load.maxRejects == Some(9L))
    assert(cli.load.sourceOptions == Map("header" -> "true", "delimiter" -> "|"))
    assert(cli.pgUrl == "jdbc:postgresql://h/db" && cli.pgUser == "u" && cli.pgPassword == "p")
  }

  test("defaults mirror the reference (batch 1000, parallelism 1)") {
    val cli = Main.parse(base ++ Seq("--pg_user", "u", "--pg_password", "p"), Map.empty).toOption.get
    assert(cli.load.batchSize == 1000 && cli.load.parallelism == 1)
    assert(cli.load.partitionCols.isEmpty && cli.load.maxRejects.isEmpty)
  }

  test("credentials fall back to PGUSER/PGPASSWORD env") {
    val cli = Main.parse(base, Map("PGUSER" -> "envu", "PGPASSWORD" -> "envp")).toOption.get
    assert(cli.pgUser == "envu" && cli.pgPassword == "envp")
  }

  test("missing required flag is a usage error, not an exception") {
    val err = Main.parse(Seq("--source", "csv"), Map.empty)
    assert(err.isLeft && err.swap.toOption.get.contains("--path"))
  }

  test("malformed numeric flags are usage errors, not NumberFormatExceptions") {
    val err = Main.parse(base ++ Seq("--pg_user", "u", "--pg_password", "p",
      "--batch_size", "abc"), Map.empty)
    assert(err.isLeft && err.swap.toOption.get.contains("--batch_size"))
    val err2 = Main.parse(base ++ Seq("--pg_user", "u", "--pg_password", "p",
      "--max_rejects", "many"), Map.empty)
    assert(err2.isLeft)
  }

  test("a flag followed by another flag is a missing-value usage error") {
    // `--pg_user --pg_password` must NOT set user to '--pg_password' and
    // silently fall through to env credentials.
    val err = Main.parse(base ++ Seq("--pg_user", "--pg_password"), Map("PGPASSWORD" -> "p"))
    assert(err.isLeft && err.swap.toOption.get.contains("--pg_user expects a value"))
    // trailing lone flag, same error
    val err2 = Main.parse(base ++ Seq("--pg_user", "u", "--pg_password", "p", "--batch_size"), Map.empty)
    assert(err2.isLeft && err2.swap.toOption.get.contains("--batch_size expects a value"))
  }

  test("malformed --source_opt is rejected") {
    val err = Main.parse(base ++ Seq("--pg_user", "u", "--pg_password", "p",
      "--source_opt", "noequals"), Map.empty)
    assert(err.isLeft)
  }
}
