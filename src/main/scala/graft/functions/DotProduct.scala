package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static mirror the generated Java calls into (the [[SrpSignatureImpl]]
  * pattern).
  */
object DotProductImpl {

  /** Strict left-to-right dot product — the compiled twin of
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` over double-cast arrays,
    * and therefore bit-identical to it on the HOF's whole domain:
    *
    *  - the fold performs the SAME IEEE op sequence (widen element, one
    *    multiply, one add, in index order), so results carry the exact
    *    bits the DuckDB oracle twin (`list_reduce` over `list_transform`)
    *    reproduces;
    *  - mismatched lengths return null, exactly as zip_with's null padding
    *    nulls the whole fold; a null ELEMENT on either side nulls it too;
    *  - two empty arrays fold to the seed, 0.0.
    *
    * @return boxed dot product, or null (degenerate pairing)
    */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}

/** Codegen'd vector dot product over ARRAY<FLOAT|DOUBLE> columns. The
  * interpreted form — `aggregate(zip_with(…))` — pays ~dim interpreted
  * double ops per EVALUATION, which is per candidate PAIR in the exact
  * similarity stages (SemDeDup's within-cluster scan, brute/IVF top-k
  * scoring, near-dup verification); this runs the same strict left fold as
  * one compiled loop inside WholeStageCodegen. Bit-equivalence to the HOF
  * form is pinned in DotProductSpec; [[graft.operators.VectorOps.dot]] (and
  * through it `norm2`/`cosine`) routes here, keeping every hash-gated cosine
  * output unchanged.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two ARRAY<FLOAT|DOUBLE>, got ${l.catalogString}, ${r.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (aC, bC) => {
      val r = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $r = graft.functions.DotProductImpl.dot(
         |  $aC, $bC, ${isFloat(left)}, ${isFloat(right)});
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
