package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared implementation of the per-row SimHash fold: one compiled pass
  * over a token-hash array maintaining `bits` vote counters; bit `b` of the
  * signature is set iff more hashes have PHYSICAL bit `b` set than clear
  * (`(h >> b) & 1`, the [[graft.operators.SimHash]] vote — `% 2` would
  * treat every bit of a negative hash as clear). A top-level object so the
  * codegen'd Java can call it through the static mirror
  * `graft.functions.SimHashSigImpl` (the [[PolyHashImpl]] pattern).
  */
object SimHashSigImpl {

  def sig(th: ArrayData, bits: Int): Long = {
    val n = th.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      // A null element votes like h = 0 (every bit clear) — exactly the
      // aggregate/HOF behavior: its when(null === 1) falls to the −1 branch.
      val h = if (th.isNullAt(i)) 0L else th.getLong(i)
      var b = 0
      while (b < bits) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Codegen'd per-row SimHash signature — the zero-shuffle form of
  * [[graft.operators.SimHash.signatures]]: the previous explode → 60-SUM
  * hash aggregate computed the same votes but paid a shuffle carrying
  * 60-column partial state per document; the interpreted `simhashOf` HOF
  * computed them per-row but ran one interpreted lambda per BIT. This
  * expression is one compiled fold per row — signatures become
  * embarrassingly parallel, and the only shuffle left in the banded
  * near-dup pipelines is the band-key join itself. Equivalence to both
  * formulations is pinned in SimHashSpec (including negative hashes and
  * the null/empty → 0 contract at the caller).
  */
case class SimHashSig(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) | org.apache.spark.sql.types.NullType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash_sig expects ARRAY<BIGINT>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHashSigImpl.sig(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashSigImpl.sig($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}
