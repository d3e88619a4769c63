package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Shared implementation of the per-row MinHash fold: hash every shingle
  * ([[PolyHashImpl]], base 31 — the cross-engine document hash) and
  * maintain the minimum of each permutation
  * `h_k(x) = ((2k+1)·x + k² + 41) mod 1e9+7` in one compiled pass
  * (the [[graft.operators.MinHashLsh]] family, which the DuckDB oracle
  * recomputes). Null shingles are skipped, matching the aggregate
  * formulation's null-skipping `min`. Empty input yields null — the
  * operator's contract is non-empty shingle arrays (callers filter
  * degenerate docs before signing).
  */
object MinHashSigImpl {
  private val P = 1000000007L

  def sig(sh: ArrayData, numHashes: Int): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    var seen = false
    while (i < n) {
      if (!sh.isNullAt(i)) {
        seen = true
        val h = PolyHashImpl.hash(sh.getUTF8String(i), 31L)
        var k = 0
        while (k < numHashes) {
          val p = (h * (2 * k + 1) + (k * k + 41)) % P
          if (p < mins(k)) mins(k) = p
          k += 1
        }
      }
      i += 1
    }
    if (!seen) return null
    new GenericArrayData(mins.map(x => x: Any))
  }
}

/** Codegen'd per-row MinHash signature — the zero-shuffle form of
  * [[graft.operators.MinHashLsh.signatures]]: the explode → polyHash →
  * k-MIN hash aggregate it replaces kept codegen but shuffled k-column
  * partial state per document; this expression folds shingle hashing and
  * all k permutation minima in one compiled pass per row, leaving the band
  * join as the pipeline's only shuffle (the [[SimHashSig]] move applied to
  * MinHash). Equivalence to the aggregate formulation is pinned in
  * MinHashLshSpec.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes >= 1 && numHashes <= 512, s"numHashes out of range: $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | org.apache.spark.sql.types.NullType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_sig expects ARRAY<STRING>, got ${other.catalogString}")
    }

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigImpl.sig(input.asInstanceOf[ArrayData], numHashes)

  // nullSafeCodeGen, not defineCodeGen: the impl returns null for an
  // empty/all-null array and the generated code must propagate that as
  // SQL NULL, not a null reference in a "non-null" slot.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSigImpl.sig($c, $numHashes);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
