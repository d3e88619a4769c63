package graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{SrpSignature, SrpSignatureImpl}
import graft.operators.VectorOps

/** Equivalence proof for the codegen'd SRP signature: the compiled
  * expression ([[SrpSignature]]) must match the interpreted per-bit
  * `when(aggregate(zip_with(…)) > 0.0, 1<<k)` column stack it replaced on
  * every WELL-FORMED vector — floats and doubles, negative/zero/denormal
  * dots, NaN elements (Spark's NaN-greatest `>` sets the bit in both forms)
  * — and must TOTALIZE the degenerate inputs where the stack was a hazard:
  * wrong-length / null-element / null vectors all fell to signature 0 there
  * (zip_with null padding nulls every dot), silently funneling malformed
  * rows into one hot LSH bucket; the compiled form nulls them out of the
  * banded join instead. Both facts are pinned here.
  */
class SrpSignatureSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val bits = 16
  private val dim = 4

  /** The retired interpreted column stack (pre-round-7 `srpSignature`), kept
    * verbatim as the reference semantics.
    */
  private def hofSignature(vec: Column, bits: Int, dim: Int): Column =
    (0 until bits).map { k =>
      val w = array((0 until dim).map(j => lit(VectorOps.srpWeight(k, j).toDouble)): _*)
      when(aggregate(zip_with(transform(vec, _.cast("double")), w, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) > 0.0, lit(1L << k))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  private def both(df: DataFrame): Map[Long, (Option[Long], Option[Long])] =
    df.select(col("id"),
        VectorOps.srpSignature(col("vec"), bits, dim).as("c"),
        hofSignature(col("vec"), bits, dim).as("h"))
      .collect().map { r =>
        def get(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getLong(0) -> (get(1), get(2))
      }.toMap

  test("matches the interpreted stack on float vectors (exact widening)") {
    val data = Seq(
      (0L, Seq(1f, 0f, -2f, 0.5f)), (1L, Seq(-1f, -1f, -1f, -1f)),
      (2L, Seq(0f, 0f, 0f, 0f)), (3L, Seq(1e-8f, -1e-8f, 1e-8f, -1e-8f)),
      (4L, Seq(123.5f, -0.25f, 7e3f, -9.75f))).toDF("id", "vec")
    val r = both(data)
    assert(r.values.forall { case (c, h) => c == h && c.isDefined })
    assert(r.values.map(_._1).toSet.size > 2, "fixture must spread signatures")
  }

  test("matches the interpreted stack on doubles, including NaN elements") {
    val data = Seq(
      (0L, Seq(0.1, 0.2, 0.3, 0.4)), (1L, Seq(-5.0, 4.0, -3.0, 2.0)),
      // NaN dot: Spark's `>` is NaN-greatest, so every bit sets in BOTH forms
      (2L, Seq(Double.NaN, 1.0, 1.0, 1.0)),
      (3L, Seq(1e-300, -1e-300, 1e-300, -1e-300))).toDF("id", "vec")
    val r = both(data)
    assert(r.values.forall { case (c, h) => c == h && c.isDefined })
    assert(r(2L)._1 === Some((1L << bits) - 1L), "NaN must set every bit")
  }

  test("degenerate vectors: compiled nulls out where the stack collapsed to bucket 0") {
    val schema = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(DoubleType, containsNull = true), nullable = true)))
    val data = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(0L, Seq(1.0, 2.0, 3.0, 4.0)), Row(1L, Seq(1.0, 2.0)),
        Row(2L, Seq(1.0, null, 3.0, 4.0)), Row(3L, null)),
      schema)
    val r = both(data)
    assert(r(0L)._1 === r(0L)._2 && r(0L)._1.isDefined)
    // wrong length / null element / null vec: HOF → Some(0), compiled → None
    for (id <- Seq(1L, 2L, 3L)) {
      assert(r(id)._1.isEmpty, s"compiled must null degenerate vec $id")
      assert(r(id)._2 === Some(0L), s"HOF collapsed degenerate vec $id to 0")
    }
  }

  test("interpreted eval agrees with the codegen'd DataFrame path") {
    def evalOnce(vec: Seq[Any], tpe: DataType): Any =
      SrpSignature(Literal.create(vec, ArrayType(tpe)), bits, dim).eval(null)
    val viaDf = both(Seq((0L, Seq(1.0, 0.0, -2.0, 0.5))).toDF("id", "vec"))(0L)._1
    assert(Some(evalOnce(Seq(1.0, 0.0, -2.0, 0.5), DoubleType)) === viaDf.map(x => x: Any))
    assert(evalOnce(Seq(1.0, 2.0), DoubleType) === null)
    // float child through direct eval (exercises the widening branch)
    val viaDfF = Seq((0L, Seq(1f, 0f, -2f, 0.5f))).toDF("id", "vec")
      .select(VectorOps.srpSignature(col("vec"), bits, dim)).collect()(0).getLong(0)
    assert(evalOnce(Seq(1f, 0f, -2f, 0.5f), FloatType) === viaDfF)
  }

  test("weight formula has one source of truth and the pack is row-major") {
    assert(VectorOps.srpWeight(3, 5) === SrpSignatureImpl.weight(3, 5))
    val w = SrpSignatureImpl.weights(bits, dim)
    assert(w.length === bits * dim)
    assert(w(2 * dim + 3) === SrpSignatureImpl.weight(2, 3).toDouble)
  }

  test("semantically equal expressions canonicalize equal; bad widths rejected") {
    val mk = () => SrpSignature(
      Literal.create(Seq(1.0, 2.0, 3.0, 4.0), ArrayType(DoubleType)), bits, dim)
    assert(mk().semanticEquals(mk()))
    intercept[IllegalArgumentException](SrpSignature(Literal(1), 0, dim))
    intercept[IllegalArgumentException](SrpSignature(Literal(1), 64, dim))
  }
}
