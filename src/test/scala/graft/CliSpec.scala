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

  test("--flag=value attached form is the escape hatch for '--'-leading values") {
    val cli = Main.parse(base ++ Seq(
      "--pg_user=u", "--pg_password=--not-a-flag", "--source_opt=quote=\""), Map.empty).toOption.get
    assert(cli.pgUser == "u" && cli.pgPassword == "--not-a-flag")
    // value split at the FIRST '=' only
    assert(cli.load.sourceOptions == Map("quote" -> "\""))
  }

  private def writeTemp(content: String): java.nio.file.Path = {
    val f = java.nio.file.Files.createTempFile("graft-cli", ".ini")
    f.toFile.deleteOnExit()
    java.nio.file.Files.write(f, content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    f
  }

  test("--config supplies credentials and type overrides; flags outrank it, env is last") {
    val ini = writeTemp(
      """[my_database_credentials]
        |host = confh
        |database = confdb
        |user = confu
        |password = confp
        |[pg_to_spark_data_type_mapping]
        |integer = bigint
        |""".stripMargin)
    val noUrl = Seq("--source", "csv", "--path", "/in", "--target_pg_table", "t")
    // all credentials from the file
    val fromFile = Main.parse(noUrl ++ Seq("--config", ini.toString), Map.empty).toOption.get
    assert(fromFile.pgUrl == "jdbc:postgresql://confh:5432/confdb")
    assert(fromFile.pgUser == "confu" && fromFile.pgPassword == "confp")
    assert(fromFile.load.typeOverrides == Map("integer" -> "bigint"))
    // explicit flag beats the file; the file beats env
    val mixed = Main.parse(noUrl ++ Seq("--config", ini.toString, "--pg_user", "flagu"),
      Map("PGUSER" -> "envu", "PGPASSWORD" -> "envp")).toOption.get
    assert(mixed.pgUser == "flagu" && mixed.pgPassword == "confp")
  }

  test("--config errors are usage errors: unreadable file, bad ini, bad type name") {
    val noUrl = Seq("--source", "csv", "--path", "/in", "--target_pg_table", "t")
    assert(Main.parse(noUrl ++ Seq("--config", "/no/such/file.ini"), Map.empty).isLeft)
    val badIni = writeTemp("key before section\n")
    assert(Main.parse(noUrl ++ Seq("--config", badIni.toString), Map.empty)
      .swap.toOption.get.contains("line 1"))
    val badType = writeTemp(
      "[my_database_credentials]\nhost=h\ndatabase=d\nuser=u\npassword=p\n" +
        "[pg_to_spark_data_type_mapping]\ninteger = not_a_type\n")
    val err = Main.parse(noUrl ++ Seq("--config", badType.toString), Map.empty)
    assert(err.isLeft && err.swap.toOption.get.contains("not_a_type"))
  }
}
