package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cli.IniConfig

/** INI parsing for reference-style `config.ini` files
  * (`/root/reference/config.ini:1-26`): section/key case-folding, both
  * separators, comments, and the credentials → JDBC-URL mapping.
  */
class IniConfigSpec extends AnyFunSuite {

  private val referenceShaped =
    """; reference-style config
      |[My_Database_Credentials]
      |host = db.internal
      |database = warehouse
      |port = 6432
      |User: loader
      |password = s3cr3t==trailing
      |
      |# python class dispatch — parsed, unused in graft
      |[source_data_class_mapping]
      |s3_module = get_s3_data_as_df
      |
      |[pg_to_spark_data_type_mapping]
      |integer = int
      |numeric = decimal
      |""".stripMargin

  test("parses sections, folds key/section case, keeps value case and '='s") {
    val ini = IniConfig.parse(referenceShaped).toOption.get
    assert(ini.section(IniConfig.CredentialsSection)("host") == "db.internal")
    // `User:` — colon separator, key lower-cased
    assert(ini.pgUser() == Some("loader"))
    // value keeps its case and any '=' beyond the first separator
    assert(ini.pgPassword() == Some("s3cr3t==trailing"))
    assert(ini.section(IniConfig.TypeMappingSection) ==
      Map("integer" -> "int", "numeric" -> "decimal"))
  }

  test("credentials section builds a JDBC URL; port defaults to 5432") {
    val ini = IniConfig.parse(referenceShaped).toOption.get
    assert(ini.pgUrl() == Some("jdbc:postgresql://db.internal:6432/warehouse"))
    val noPort = IniConfig.parse(
      "[my_database_credentials]\nhost = h\ndatabase = d\n").toOption.get
    assert(noPort.pgUrl() == Some("jdbc:postgresql://h:5432/d"))
    // missing host or database → no URL, not a half-built one
    val hostOnly = IniConfig.parse("[my_database_credentials]\nhost = h\n").toOption.get
    assert(hostOnly.pgUrl() == None)
  }

  test("malformed input is a positioned error, not a silent drop") {
    assert(IniConfig.parse("key = before any section\n").swap.toOption.get.contains("line 1"))
    assert(IniConfig.parse("[s]\njust a bare line\n").swap.toOption.get.contains("line 2"))
    assert(IniConfig.parse("[]\n").isLeft)
  }

  test("missing section reads as empty, and lookups are case-insensitive") {
    val ini = IniConfig.parse(referenceShaped).toOption.get
    assert(ini.section("no_such_section").isEmpty)
    assert(ini.section("MY_DATABASE_CREDENTIALS")("database") == "warehouse")
  }
}
