package graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CentroidPack, NearestCentroid}
import graft.operators.VectorOps

/** Equivalence proof for the codegen'd nearest-centroid assignment: the
  * compiled expression ([[NearestCentroid]]) must match the interpreted
  * `aggregate(zip_with(…))` fold it replaced on that fold's whole
  * NON-THROWING domain — floats and doubles, ties, mismatched lengths, null
  * elements, null vectors — and must TOTALIZE the one input class where the
  * fold was broken: under the sessions' default ANSI mode a zero-norm
  * vector/centroid made the fold's `dot / sqrt(vnn * cnn)` raise
  * DIVIDE_BY_ZERO; the compiled form skips that centroid (null cosine never
  * replaces the running best). Both facts are pinned here.
  */
class NearestCentroidSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def asD(c: Column): Column = transform(c, _.cast("double"))
  private def nn(c: Column): Column =
    aggregate(zip_with(asD(c), asD(c), (x, y) => x * y), lit(0.0), (a, x) => a + x)
  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(asD(a), asD(b), (x, y) => x * y), lit(0.0), (a2, x) => a2 + x)

  /** The retired interpreted HOF fold (pre-round-6 `assignWithVec`), kept
    * verbatim as the reference semantics.
    */
  private def hofAssign(data: DataFrame, centroids: DataFrame): DataFrame = {
    val packed = broadcast(
      centroids.select(struct(
          col("id").cast("long").as("cid"), asD(col("vec")).as("cvec"),
          nn(col("vec")).as("cnn")).as("c"))
        .agg(array_sort(collect_list(col("c"))).as("cents")))
    val best = aggregate(
      col("cents"),
      struct(lit(null).cast("long").as("cid"), lit(Double.NegativeInfinity).as("ccos")),
      (acc, c) => {
        val cc = dotD(col("vec"), c.getField("cvec")) / sqrt(col("vnn") * c.getField("cnn"))
        when(cc > acc.getField("ccos"),
          struct(c.getField("cid").as("cid"), cc.as("ccos"))).otherwise(acc)
      })
    data.select(col("id"), col("vec"), nn(col("vec")).as("vnn"))
      .crossJoin(packed)
      .select(col("id"), best.getField("cid").as("cluster_id"))
  }

  private def compiled(data: DataFrame, centroids: DataFrame): DataFrame =
    VectorOps.assignWithVec(data, centroids, "id", "vec")
      .select(col("id"), col("cluster_id"))

  private def toMap(df: DataFrame): Map[Long, Option[Long]] =
    df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  private val floatData = Seq(
    (0L, Seq(1f, 0f, 0f)), (1L, Seq(0f, 1f, 0f)), (2L, Seq(0.6f, 0.8f, 0f)),
    (3L, Seq(-1f, -0.25f, 0.5f)), (4L, Seq(0.1f, 0.2f, 0.3f)),
    (5L, Seq(1e-4f, -2e-4f, 3e-4f))).toDF("id", "vec")
  private val floatCents = Seq(
    (10L, Seq(1f, 0.1f, 0f)), (11L, Seq(0f, 1f, 0.1f)),
    (12L, Seq(-0.5f, -0.5f, 0.5f))).toDF("id", "vec")

  test("matches the interpreted HOF fold on float vectors (exact widening)") {
    val c = toMap(compiled(floatData, floatCents))
    assert(c === toMap(hofAssign(floatData, floatCents)))
    assert(c.values.forall(_.isDefined) && c.values.flatten.toSet.size > 1,
      "fixture must exercise several clusters")
  }

  test("matches the HOF fold on doubles; exact cosine ties keep the smallest cid") {
    val data = Seq((0L, Seq(2.0, 0.0)), (1L, Seq(0.0, 3.0)), (2L, Seq(1.0, 1.0)))
      .toDF("id", "vec")
    // 20 and 21 are the same direction scaled by a power of two, so their
    // cosines tie BIT-EXACTLY (×2 and sqrt(4x)=2·sqrt(x) are exact in IEEE);
    // the smaller cid must win in both forms.
    val cents = Seq((21L, Seq(1.0, 1.0)), (20L, Seq(2.0, 2.0)), (30L, Seq(1.0, 0.0)))
      .toDF("id", "vec")
    val c = toMap(compiled(data, cents))
    assert(c === toMap(hofAssign(data, cents)))
    assert(c(2L) === Some(20L), "tie must break to the smallest centroid id")
  }

  test("degenerate vectors (wrong length, null element, null vec) are null in both forms") {
    val schema = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(DoubleType, containsNull = true), nullable = true)))
    val data = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(0L, Seq(1.0, 2.0)), Row(1L, Seq(1.0, 2.0, 3.0)),
        Row(2L, Seq(1.0, null)), Row(3L, null)),
      schema)
    val cents = Seq((0L, Seq(1.0, 1.0))).toDF("id", "vec")
    val c = toMap(compiled(data, cents))
    assert(c === toMap(hofAssign(data, cents)))
    assert(c(0L).isDefined && c(1L).isEmpty && c(2L).isEmpty && c(3L).isEmpty)
  }

  test("zero-norm vector: compiled totalizes to null where the HOF fold threw (ANSI)") {
    val data = Seq((0L, Seq(0.0, 0.0)), (1L, Seq(1.0, 0.0))).toDF("id", "vec")
    val cents = Seq((7L, Seq(1.0, 1.0))).toDF("id", "vec")
    val c = toMap(compiled(data, cents))
    assert(c(0L).isEmpty && c(1L) === Some(7L))
    val e = intercept[Exception](hofAssign(data, cents).collect())
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10).map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(chain.contains("DIVIDE_BY_ZERO"),
      s"expected the interpreted fold to raise DIVIDE_BY_ZERO, got:\n$chain")
  }

  test("zero-norm centroid is skipped, never preferred (naive NaN would outrank)") {
    val data = Seq((0L, Seq(1.0, 0.0))).toDF("id", "vec")
    val cents = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(0.9, 0.1))).toDF("id", "vec")
    assert(toMap(compiled(data, cents))(0L) === Some(2L))
  }

  test("empty centroid set assigns null to every vector") {
    val data = Seq((0L, Seq(1.0, 0.0))).toDF("id", "vec")
    val cents = Seq.empty[(Long, Seq[Double])].toDF("id", "vec")
    assert(toMap(compiled(data, cents))(0L).isEmpty)
  }

  test("interpreted eval agrees with the codegen'd DataFrame path") {
    val pack = CentroidPack.pack(Seq(5L -> Array(1.0, 0.2), 9L -> Array(-0.3, 1.0)))
    def evalOnce(vec: Seq[Double]): Any = {
      val vnn = vec.foldLeft(0.0)((a, x) => a + x * x)
      NearestCentroid(Literal.create(vec, ArrayType(DoubleType)), Literal(vnn), pack)
        .eval(null)
    }
    assert(evalOnce(Seq(0.9, 0.1)) === 5L)
    assert(evalOnce(Seq(-0.1, 0.9)) === 9L)
    assert(evalOnce(Seq(0.0, 0.0)) === null)
    // float child through direct eval too (exercises the widening branch)
    val fl = NearestCentroid(
      Literal.create(Seq(0.9f, 0.1f), ArrayType(FloatType)),
      Literal(0.9f.toDouble * 0.9f.toDouble + 0.1f.toDouble * 0.1f.toDouble), pack).eval(null)
    assert(fl === 5L)
    // same inputs through the DataFrame (whole-stage codegen) path
    val viaDf = toMap(compiled(
      Seq((0L, Seq(0.9, 0.1)), (1L, Seq(-0.1, 0.9)), (2L, Seq(0.0, 0.0))).toDF("id", "vec"),
      Seq((5L, Seq(1.0, 0.2)), (9L, Seq(-0.3, 1.0))).toDF("id", "vec")))
    assert(viaDf === Map(0L -> Some(5L), 1L -> Some(9L), 2L -> None))
  }

  test("semantically equal expressions canonicalize equal (pack content equality)") {
    val p1 = CentroidPack.pack(Seq(1L -> Array(1.0, 2.0)))
    val p2 = CentroidPack.pack(Seq(1L -> Array(1.0, 2.0)))
    assert(p1 === p2 && p1.hashCode === p2.hashCode)
    val mk = (p: CentroidPack) => NearestCentroid(
      Literal.create(Seq(1.0, 2.0), ArrayType(DoubleType)), Literal(5.0), p)
    assert(mk(p1).semanticEquals(mk(p2)))
    assert(p1 !== CentroidPack.pack(Seq(1L -> Array(1.0, 3.0))))
  }

  test("mixed-dimension centroid sets are rejected loudly at pack time") {
    val e = intercept[IllegalArgumentException](
      CentroidPack.pack(Seq(1L -> Array(1.0), 2L -> Array(1.0, 2.0))))
    assert(e.getMessage.contains("dimensionality"))
  }
}
