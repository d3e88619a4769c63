package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Centroid set for [[NearestCentroid]], packed driver-side into primitive
  * arrays: `flat` is the row-major |centroids|×dim matrix of double
  * coefficients, `cnns` the squared norms, `cids` the cluster ids — sorted
  * ascending by cid so the fold's replace-on-strictly-greater tie-break
  * keeps the SMALLEST id, matching an `ORDER BY cos DESC, cid` rank-1
  * window. An opaque holder (not expression children): centroids are loop
  * constants, shipped once per task via the codegen reference array, not
  * evaluated per row.
  */
final case class CentroidPack(cids: Array[Long], flat: Array[Double],
    cnns: Array[Double], dim: Int) {
  require(cids.length == cnns.length && cids.length * dim == flat.length,
    s"inconsistent centroid pack: ${cids.length} ids, ${cnns.length} norms, " +
      s"${flat.length} coefficients for dim $dim")
  override def toString: String = s"CentroidPack(${cids.length} x $dim)"

  // Case-class equality over Array fields is reference identity, which would
  // make two semantically identical NearestCentroid expressions never compare
  // equal — defeating Catalyst canonicalization / semanticEquals / common-
  // subexpression elimination. Compare contents (Arrays.equals uses
  // Double.equals semantics: NaN==NaN, +0!=-0 — right for canonicalization).
  override def equals(o: Any): Boolean = o match {
    case p: CentroidPack => dim == p.dim &&
      java.util.Arrays.equals(cids, p.cids) &&
      java.util.Arrays.equals(flat, p.flat) &&
      java.util.Arrays.equals(cnns, p.cnns)
    case _ => false
  }
  override def hashCode: Int =
    31 * (31 * (31 * dim + java.util.Arrays.hashCode(cids)) +
      java.util.Arrays.hashCode(flat)) + java.util.Arrays.hashCode(cnns)
}

object CentroidPack {

  /** Pack (cid, coefficients) pairs driver-side: sorted ascending by cid (so
    * the fold's replace-on-strictly-greater keeps the smallest id on ties),
    * squared norms folded strictly left-to-right (the same IEEE op sequence
    * as the `norm2` column the interpreted form used, so values are
    * bit-identical). All centroids must share one dimensionality — a
    * mixed-dim centroid set has no meaningful nearest-by-cosine semantics
    * (the HOF twin would null out every differing-length pairing) and is
    * rejected loudly rather than silently mis-assigned.
    */
  def pack(centroids: Seq[(Long, Array[Double])]): CentroidPack = {
    val sorted = centroids.sortBy(_._1)
    val dim = if (sorted.isEmpty) 0 else sorted.head._2.length
    require(sorted.forall(_._2.length == dim),
      s"centroids must share one dimensionality, got lengths " +
        sorted.map(_._2.length).distinct.mkString("{", ",", "}"))
    val n = sorted.length
    val cids = new Array[Long](n)
    val flat = new Array[Double](n * dim)
    val cnns = new Array[Double](n)
    var i = 0
    while (i < n) {
      val (cid, v) = sorted(i)
      cids(i) = cid
      var nn = 0.0
      var j = 0
      while (j < dim) {
        flat(i * dim + j) = v(j)
        nn += v(j) * v(j)
        j += 1
      }
      cnns(i) = nn
      i += 1
    }
    CentroidPack(cids, flat, cnns, dim)
  }
}

/** Static mirror the generated Java calls into (same pattern as
  * [[PolyHashImpl]]).
  */
object NearestCentroidImpl {

  /** Nearest-centroid id of `vec` by cosine — the compiled twin of the
    * interpreted `aggregate(cents, …)` fold it replaces (proven equivalent
    * on the fold's whole non-throwing domain in NearestCentroidSpec):
    *
    *  - dot products fold STRICTLY left-to-right over doubles (same IEEE op
    *    sequence as `aggregate(zip_with(…))`, so results are bit-identical);
    *  - cosine is the single expression `dot / sqrt(vnn * cnn)`;
    *  - a ZERO divisor yields a null cosine, which never replaces the
    *    running best — a zero-norm vector gets a null cluster id and a
    *    zero-norm centroid is skipped. This deliberately TOTALIZES the
    *    interpreted twin rather than replicating it: under the sessions'
    *    default ANSI mode a double `Divide` by 0.0 is a runtime
    *    DIVIDE_BY_ZERO error, so the HOF fold would have crashed on any
    *    zero-norm input (NearestCentroidSpec pins both facts). Naive Java
    *    division would be wrong a third way: NaN/±Infinity outrank every
    *    finite cosine under [[SQLOrderingUtil]];
    *  - the running best is replaced only on STRICTLY greater, compared with
    *    Spark's `GreaterThan` double semantics ([[SQLOrderingUtil]]: NaN
    *    greater than everything) — first/minimum cid wins ties;
    *  - a vec of mismatched length or with null elements makes every
    *    fold-step cosine null in the HOF form (zip_with pads with nulls),
    *    which never replaces the seed — here: return null immediately.
    *
    * @param isFloat whether `vec` holds floats (widened exactly) or doubles
    * @return boxed cluster id, or null (no centroids / degenerate vec)
    */
  def assign(vec: ArrayData, vnn: Double, c: CentroidPack, isFloat: Boolean): java.lang.Long = {
    val dim = c.dim
    if (vec.numElements() != dim) return null
    val v = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (vec.isNullAt(j)) return null
      v(j) = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
      j += 1
    }
    var bestCos = Double.NegativeInfinity
    var best: java.lang.Long = null
    val n = c.cids.length
    val flat = c.flat
    val cnns = c.cnns
    var ci = 0
    var off = 0
    while (ci < n) {
      // Divisor-zero ⇒ null cosine ⇒ skip (totalizing what ANSI Divide
      // makes a runtime error — see scaladoc). Checked on the computed
      // divisor, not on vnn/cnn individually: a denormal product can
      // underflow to 0.0 even when both norms are nonzero.
      val denom = java.lang.Math.sqrt(vnn * cnns(ci))
      if (denom != 0.0) {
        var dot = 0.0
        var k = 0
        while (k < dim) {
          dot += v(k) * flat(off + k)
          k += 1
        }
        val cos = dot / denom
        if (SQLOrderingUtil.compareDoubles(cos, bestCos) > 0) {
          bestCos = cos
          best = c.cids(ci)
        }
      }
      ci += 1
      off += dim
    }
    best
  }
}

/** Codegen'd nearest-centroid assignment: `left` is the vector column
  * (ARRAY<FLOAT> or ARRAY<DOUBLE>), `right` its precomputed squared norm,
  * `pack` the broadcast-as-reference centroid matrix. The interpreted
  * higher-order form (`aggregate` over an array-of-structs with a nested
  * `zip_with` fold per element) never enters whole-stage codegen and pays
  * ~|centroids|·dim interpreted double ops per row; this runs the same fold
  * as one compiled JVM loop and keeps the assignment operator inside
  * WholeStageCodegen — the hot path of every IVF build and k-means
  * iteration.
  */
case class NearestCentroid(left: Expression, right: Expression, pack: CentroidPack)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid"

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_nearest_centroid expects (ARRAY<FLOAT|DOUBLE>, DOUBLE), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  // BinaryExpression's default eval short-circuits null children to null —
  // the HOF twin does the same (null vec/norm ⇒ null cosines ⇒ seed cid).
  override protected def nullSafeEval(vec: Any, vnn: Any): Any =
    NearestCentroidImpl.assign(
      vec.asInstanceOf[ArrayData], vnn.asInstanceOf[Double], pack, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val packRef = ctx.addReferenceObj("centroidPack", pack,
      classOf[CentroidPack].getName)
    nullSafeCodeGen(ctx, ev, (vecC, vnnC) => {
      val r = ctx.freshName("nearest")
      s"""
         |java.lang.Long $r = graft.functions.NearestCentroidImpl.assign(
         |  $vecC, $vnnC, $packRef, $isFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}
