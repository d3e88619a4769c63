package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the dbt-test / Deequ
  * shape: a table plus a set of constraints in, one small
  * `(check_name, violations)` summary out. The reference validates its
  * input only implicitly (rows the target Postgres rejects surface through
  * the sink's binary split, `/root/reference/psycopg2_database_helper.py:70-120`);
  * a 100 TB pipeline wants the violations COUNTED BEFORE the load, as one
  * cheap pass, not discovered one savepoint rollback at a time.
  *
  * Scale design: all row-level checks (not-null, range, arbitrary
  * predicates) FUSE into a single aggregate over one scan — adding a check
  * adds a sum column, not a pass. Uniqueness is one key-grouped aggregate
  * (count surplus rows per duplicated key); referential integrity is one
  * anti-join against the distinct referenced keys (broadcast-able when the
  * dimension is small). Each result is a 1-row (or k-row) aggregate, so
  * the union that assembles the report moves O(#checks) rows, never data.
  */
object DqChecks {

  /** A per-row constraint: `violated` must evaluate true for rows that
    * BREAK the constraint. Use the helpers below for the common cases.
    */
  final case class RowCheck(name: String, violated: Column)

  /** Constraint: `column` must not be NULL. */
  def notNull(name: String, column: Column): RowCheck =
    RowCheck(name, column.isNull)

  /** Constraint: `pred` must hold; a NULL predicate counts as a violation
    * (SQL CHECK semantics are the opposite — document the difference
    * where it matters, a data-quality report wants unknowns surfaced).
    */
  def satisfies(name: String, pred: Column): RowCheck =
    RowCheck(name, !coalesce(pred, lit(false)))

  /** Multiplicity constraint: the key `cols` must be unique. Violations =
    * number of surplus rows (rows beyond the first per duplicated key).
    */
  final case class UniqueCheck(name: String, cols: Seq[String])

  /** Referential constraint: every non-NULL `cols` tuple must exist in
    * `ref`'s `refCols` (NULL foreign keys are not violations, matching
    * SQL FK semantics). Violations = number of orphan rows.
    */
  final case class FkCheck(
      name: String, cols: Seq[String], ref: DataFrame, refCols: Seq[String])

  /** Runs every constraint against `df`; returns (check_name, violations)
    * sorted by check_name, one row per constraint, zeros included.
    */
  def check(
      df: DataFrame,
      rowChecks: Seq[RowCheck] = Nil,
      uniques: Seq[UniqueCheck] = Nil,
      fks: Seq[FkCheck] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniques.nonEmpty || fks.nonEmpty,
      "at least one constraint required")
    val names = rowChecks.map(_.name) ++ uniques.map(_.name) ++ fks.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate check names: ${names.diff(names.distinct).mkString(", ")}")
    // names are spliced into a stack() SQL expression and backtick-quoted
    // aliases — reject the two characters that would break either context
    require(names.forall(n => !n.contains("'") && !n.contains("`")),
      "check names must not contain quote characters")

    val parts = Seq.newBuilder[DataFrame]

    if (rowChecks.nonEmpty) {
      // ONE pass for every row-level check: each is a conditional sum
      // column of the same aggregate, unpivoted to rows by stack().
      val aggCols = rowChecks.map(c =>
        coalesce(sum(c.violated.cast("long")), lit(0L)).as(c.name))
      val stackArgs = rowChecks
        .map(c => s"'${c.name}', `${c.name}`").mkString(", ")
      parts += df.agg(aggCols.head, aggCols.tail: _*)
        .select(expr(
          s"stack(${rowChecks.size}, $stackArgs) AS (check_name, violations)"))
    }

    uniques.foreach { u =>
      parts += df
        .groupBy(u.cols.map(col): _*).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1)
        .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("violations"))
        .select(lit(u.name).as("check_name"), col("violations"))
    }

    fks.foreach { f =>
      require(f.cols.size == f.refCols.size,
        s"${f.name}: cols and refCols must align")
      val refKeys = f.ref
        .select(f.refCols.zip(f.cols).map { case (rc, c) => col(rc).as(c) }: _*)
        .distinct()
      val nonNull = f.cols.map(col(_).isNotNull).reduce(_ && _)
      parts += df.filter(nonNull)
        .join(refKeys, f.cols, "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(f.name).as("check_name"), col("violations"))
    }

    parts.result().reduce(_ unionByName _).orderBy(col("check_name"))
  }
}
