package graft.cli

/** Minimal INI reader for migrating a reference-style `config.ini`
  * (`/root/reference/config.ini:1-26`) onto graft's CLI. Supported syntax is
  * exactly what ConfigParser accepts in that file: `[section]` headers,
  * `key = value` (or `key: value`) pairs, `;`/`#` comment lines, blank lines.
  * Keys and section names are case-insensitive (lower-cased on read), values
  * keep their case.
  *
  * The three reference sections map as:
  *  - `[my_database_credentials]` (host/port/database/user/password) →
  *    JDBC URL + credentials, consumed by `--config` in [[Main.parse]];
  *  - `[pg_to_spark_data_type_mapping]` → overrides for
  *    [[graft.types.PgTypeMapping.toSparkType]];
  *  - `[source_data_class_mapping]` (Python module/class names for
  *    reflective dispatch) has no Scala analog — source dispatch is the
  *    compile-time [[graft.sources.SourceRegistry]], whose aliases already
  *    cover the reference's section names. Parsed but unused.
  *
  * Unlike the reference — which resolves `config.ini` against its own module
  * directory with a hard-coded Windows separator
  * (`/root/reference/load_postgres_from_spark_df.py:57-60`) — the path comes
  * from the caller.
  */
object IniConfig {

  final case class Ini(sections: Map[String, Map[String, String]]) {
    def section(name: String): Map[String, String] =
      sections.getOrElse(name.toLowerCase, Map.empty)

    /** Reference credentials section → (jdbcUrl, user, password), each
      * present only if its keys are. The URL needs host + database; port
      * defaults to 5432 like the reference fixture.
      */
    def pgUrl(sectionName: String = CredentialsSection): Option[String] = {
      val s = section(sectionName)
      for (host <- s.get("host"); db <- s.get("database"))
        yield s"jdbc:postgresql://$host:${s.getOrElse("port", "5432")}/$db"
    }
    def pgUser(sectionName: String = CredentialsSection): Option[String] =
      section(sectionName).get("user")
    def pgPassword(sectionName: String = CredentialsSection): Option[String] =
      section(sectionName).get("password")
  }

  /** The reference's hard-coded section name
    * (`/root/reference/load_postgres_from_spark_df.py:68-70`).
    */
  val CredentialsSection = "my_database_credentials"
  val TypeMappingSection = "pg_to_spark_data_type_mapping"

  def parse(text: String): Either[String, Ini] = {
    val sections = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    var current: Option[String] = None
    for ((raw, idx) <- text.linesIterator.zipWithIndex) {
      val line = raw.trim
      if (line.isEmpty || line.startsWith(";") || line.startsWith("#")) ()
      else if (line.startsWith("[") && line.endsWith("]")) {
        val name = line.substring(1, line.length - 1).trim.toLowerCase
        if (name.isEmpty) return Left(s"line ${idx + 1}: empty section name")
        current = Some(name)
        sections.getOrElseUpdate(name, scala.collection.mutable.LinkedHashMap.empty)
      } else {
        val sep = line.indexWhere(c => c == '=' || c == ':')
        if (sep <= 0) return Left(s"line ${idx + 1}: expected 'key = value', got '$line'")
        current match {
          case None => return Left(s"line ${idx + 1}: key before any [section]")
          case Some(sec) =>
            sections(sec) += line.take(sep).trim.toLowerCase -> line.drop(sep + 1).trim
        }
      }
    }
    Right(Ini(sections.map { case (k, v) => k -> v.toMap }.toMap))
  }
}
