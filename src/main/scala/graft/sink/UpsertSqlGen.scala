package graft.sink

/** Upsert-SQL codegen — builds the `INSERT … ON CONFLICT … DO UPDATE` text the
  * sink executes against Postgres. This is codegen *for the remote engine*
  * (the reference's O9, `/root/reference/psycopg2_database_helper.py:190-251`),
  * not Catalyst codegen. Differences from the reference, by design:
  *
  *  - JDBC `?` placeholders instead of psycopg2 `%s` / asyncpg `\$n`.
  *  - `uniqueKey = Nil` produces a plain INSERT (documented insert-only
  *    fallback the psycopg2 path crashes on,
  *    `/root/reference/psycopg2_database_helper.py:226` vs the working asyncpg
  *    short-circuit at `/root/reference/asyncpg_database_helper.py:229-230`).
  *  - when every non-key column is excluded from update we emit
  *    `DO NOTHING` instead of an invalid empty SET list.
  *
  * The single-update-column form is non-parenthesized (`SET c = EXCLUDED.c`),
  * matching Postgres syntax rules and the reference's special case
  * (`/root/reference/psycopg2_database_helper.py:239-246`).
  *
  * Every identifier is emitted double-quoted (embedded `"` doubled, the
  * table name quoted per dotted part so `schema.table` stays qualified):
  * the reference splices names verbatim, so a mixed-case or reserved-word
  * table/column ("User", "order", "group") produces invalid or
  * wrong-target SQL there. Quoting a name that is already lower-case is
  * semantically identical to leaving it bare (unquoted identifiers fold to
  * lower case in Postgres), so the common path is unchanged.
  */
object UpsertSqlGen {

  /** `"name"` with embedded double quotes doubled — Postgres ident quoting. */
  def quoteIdent(name: String): String = {
    require(name.nonEmpty, "cannot quote an empty identifier")
    "\"" + name.replace("\"", "\"\"") + "\""
  }

  /** Quote a possibly schema-qualified table name part-by-part. A part that
    * is already double-quoted passes through untouched, so callers holding
    * pre-quoted names (e.g. from a config file) don't get double-wrapped.
    */
  def quoteTable(name: String): String =
    name.split('.').map { p =>
      if (p.startsWith("\"") && p.endsWith("\"") && p.length >= 2) p else quoteIdent(p)
    }.mkString(".")

  def build(
      columns: Seq[String],
      tableName: String,
      uniqueKey: Seq[String] = Nil,
      colsNotForUpdate: Seq[String] = Nil): String = {
    require(columns.nonEmpty, "cannot build an INSERT with no columns")
    val qCols = columns.map(quoteIdent)
    val insert =
      s"INSERT INTO ${quoteTable(tableName)} (${qCols.mkString(", ")}) " +
        s"VALUES (${Seq.fill(columns.size)("?").mkString(", ")})"
    if (uniqueKey.isEmpty) insert
    else {
      val excluded = (uniqueKey ++ colsNotForUpdate).toSet
      val updateCols = columns.filterNot(excluded.contains).map(quoteIdent)
      val conflict = s" ON CONFLICT (${uniqueKey.map(quoteIdent).mkString(", ")})"
      if (updateCols.isEmpty) insert + conflict + " DO NOTHING"
      else {
        val set =
          if (updateCols.size == 1) s"${updateCols.head} = EXCLUDED.${updateCols.head}"
          else
            s"(${updateCols.mkString(", ")}) = " +
              s"(${updateCols.map("EXCLUDED." + _).mkString(", ")})"
        insert + conflict + s" DO UPDATE SET $set"
      }
    }
  }
}
