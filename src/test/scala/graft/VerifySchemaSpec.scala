package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the GATE-OUTPUT TYPE ALPHABET: every column type a
  * `SparkEntry.queries` gate exposes must come from the set proven safe by
  * the driver's DuckDB compare across rounds 1–15. Three oracle-environment
  * drift families have now burned a round each — r10 quantile interpolation,
  * r10 float rendering, r15 `DECIMAL(38,0)` (int128) hashing, where the
  * builder's DuckDB 1.0.0 and the driver's DuckDB disagreed on a type the
  * values themselves agreed on. The r15 verdict's directive: any gate
  * exposing a type outside the proven set must fail at `sbt test` time, not
  * at the driver.
  *
  * The proven alphabet (every member carried by ≥1 green gate in
  * CORRECTNESS_r15): INT, BIGINT, DOUBLE, STRING, DATE, BOOLEAN, TIMESTAMP,
  * TIMESTAMP_NTZ (q_scd2's validity bounds), and DECIMAL with precision
  * ≤ 18 (DuckDB's int64-backed range — width 38
  * is exactly the int128 representation the hashers diverged on). Exact
  * wide-integer pins route through their canonical digit STRING instead
  * (`StatOps.trimmedMean`, `TimeSeriesOps.acf`, …).
  *
  * Streaming gates execute their replay during construction, so this suite
  * is deliberately the last-listed schema walk, not a per-operator test.
  */
class VerifySchemaSpec extends AnyFunSuite with SparkSpec {

  private def allowed(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DoubleType | StringType | DateType |
        BooleanType | TimestampType | TimestampNTZType => true
    case d: DecimalType => d.precision <= 18
    case _ => false
  }

  test("every gate output column type is inside the proven driver alphabet") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema =
          try fn(spark, sf0001).schema
          catch {
            case e: Throwable =>
              fail(s"$name failed to build at sf0.001: ${e.getMessage}", e)
          }
        schema.fields.collect {
          case f if !allowed(f.dataType) => s"$name.${f.name}: ${f.dataType.sql}"
        }
    }
    assert(violations.isEmpty,
      s"gate columns outside the proven type alphabet (add only with driver " +
        s"evidence, never DECIMAL(p>18,s)):\n  ${violations.mkString("\n  ")}")
  }
}
