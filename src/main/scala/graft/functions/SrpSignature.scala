package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Static mirror the generated Java calls into (same pattern as
  * [[NearestCentroidImpl]]).
  */
object SrpSignatureImpl {

  /** j-th coefficient of the k-th pseudo-random hyperplane: a fixed integer
    * formula (Knuth multiplicative constant, prime modulus, centered), NOT an
    * RNG, so the DuckDB oracle reproduces the hyperplanes from the same
    * arithmetic. Values in [-501001, 501001]. This is the single source of
    * truth — `VectorOps.srpWeight` delegates here.
    */
  def weight(k: Int, j: Int): Long =
    (((k + 1L) * (j + 7L) * 2654435761L) % 1000003L) - 501001L

  /** Row-major bits×dim hyperplane matrix, packed driver-side once per
    * expression and shipped through the codegen reference array.
    */
  def weights(bits: Int, dim: Int): Array[Double] = {
    val w = new Array[Double](bits * dim)
    var k = 0
    while (k < bits) {
      var j = 0
      while (j < dim) {
        w(k * dim + j) = weight(k, j).toDouble
        j += 1
      }
      k += 1
    }
    w
  }

  /** SRP signature of `vec` — the compiled twin of the interpreted
    * per-bit `when(aggregate(zip_with(vec, w, _*_), 0.0, _+_) > 0.0, 1<<k)`
    * column stack it replaces (equivalence proven on the stack's
    * well-formed domain in SrpSignatureSpec):
    *
    *  - each dot product folds STRICTLY left-to-right over doubles (same
    *    IEEE op sequence as `aggregate(zip_with(…))`, so every dot — and
    *    therefore every SIGN — is bit-identical);
    *  - bit k is set iff dot > 0.0 under Spark's `GreaterThan` double
    *    semantics ([[SQLOrderingUtil]]: NaN greater than everything), not
    *    Java's `>` (where NaN > 0.0 is false);
    *  - a DEGENERATE vec (wrong length, null element) returns null. This
    *    deliberately TOTALIZES the interpreted twin rather than replicating
    *    it: there, zip_with's null padding nulls every dot, every
    *    `when(null > 0)` falls to 0, and the row gets signature 0 — a
    *    perfectly valid signature (all dots non-positive) that silently
    *    funnels every malformed vector into one hot LSH bucket. Null drops
    *    them from the banded join instead (SrpSignatureSpec pins both
    *    behaviors).
    *
    * @param isFloat whether `vec` holds floats (widened exactly) or doubles
    * @return boxed signature, or null (degenerate vec)
    */
  def sign(vec: ArrayData, w: Array[Double], bits: Int, dim: Int,
      isFloat: Boolean): java.lang.Long = {
    if (vec.numElements() != dim) return null
    val v = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (vec.isNullAt(j)) return null
      v(j) = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
      j += 1
    }
    var sig = 0L
    var k = 0
    var off = 0
    while (k < bits) {
      var dot = 0.0
      var i = 0
      while (i < dim) {
        dot += v(i) * w(off + i)
        i += 1
      }
      if (SQLOrderingUtil.compareDoubles(dot, 0.0) > 0) sig |= 1L << k
      k += 1
      off += dim
    }
    sig
  }
}

/** Codegen'd sign-random-projection signature (charikar'02 cosine LSH):
  * `child` is the vector column (ARRAY<FLOAT> or ARRAY<DOUBLE>), `bits` the
  * signature width, `dim` the expected dimensionality. The interpreted form
  * stacks `bits` higher-order folds (`aggregate` over `zip_with`) per row —
  * bits×dim interpreted double ops that never enter whole-stage codegen;
  * this runs the same folds as one compiled JVM loop nest and keeps the
  * signature stage (the map side of every SRP-LSH near-dup join) inside
  * WholeStageCodegen. Hyperplane weights are deterministic integers packed
  * once driver-side, so equality/canonicalization needs only (child, bits,
  * dim).
  */
case class SrpSignature(child: Expression, bits: Int, dim: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")
  require(dim >= 1, s"dim must be positive, got $dim")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_srp_signature"

  @transient private lazy val weights: Array[Double] =
    SrpSignatureImpl.weights(bits, dim)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_signature expects ARRAY<FLOAT|DOUBLE>, got ${t.catalogString}")
  }

  // UnaryExpression's default eval short-circuits a null vec to null — the
  // degenerate-input policy (scaladoc on SrpSignatureImpl.sign) extended to
  // the whole-vector-missing case.
  override protected def nullSafeEval(vec: Any): Any =
    SrpSignatureImpl.sign(vec.asInstanceOf[ArrayData], weights, bits, dim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("srpWeights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, vecC => {
      val r = ctx.freshName("srpSig")
      s"""
         |java.lang.Long $r = graft.functions.SrpSignatureImpl.sign(
         |  $vecC, $wRef, $bits, $dim, $isFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}
