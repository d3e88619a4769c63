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
  */
object UpsertSqlGen {

  def build(
      columns: Seq[String],
      tableName: String,
      uniqueKey: Seq[String] = Nil,
      colsNotForUpdate: Seq[String] = Nil): String = {
    require(columns.nonEmpty, "cannot build an INSERT with no columns")
    val insert =
      s"INSERT INTO $tableName (${columns.mkString(", ")}) " +
        s"VALUES (${Seq.fill(columns.size)("?").mkString(", ")})"
    if (uniqueKey.isEmpty) insert
    else {
      val excluded = (uniqueKey ++ colsNotForUpdate).toSet
      val updateCols = columns.filterNot(excluded.contains)
      val conflict = s" ON CONFLICT (${uniqueKey.mkString(", ")})"
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
