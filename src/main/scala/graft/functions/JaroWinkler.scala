package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static mirror the generated Java calls into. */
object JaroWinklerImpl {

  /** Standard Jaro–Winkler similarity (match window ⌊max/2⌋−1, half-count
    * transpositions, prefix bonus up to 4 chars at p = 0.1 applied only
    * above the 0.7 boost threshold) — the DEFINITION DuckDB's
    * `jaro_winkler_similarity` implements, verified bit-for-bit against it
    * over fixture name pairs plus the textbook cases (JaroWinklerSpec
    * documents the probe). Divisions and the final blend are sequenced
    * exactly as the oracle twin computes them, so the emitted double is
    * hash-gateable.
    *
    * Operates char-wise on the UTF-16 representation — identical to the
    * oracle for ASCII/BMP text, the gated domain.
    */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    if (s1 == s2) return 1.0
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val md = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var matched = false
      while (j < hi && !matched) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val mD = m.toDouble
    val jaro = (mD / l1 + mD / l2 + (mD - t) / mD) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val pmax = math.min(4, math.min(l1, l2))
    while (l < pmax && s1.charAt(l) == s2.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Codegen'd Jaro–Winkler similarity over two STRING columns — the fuzzy
  * name-match scalar next to [[graft.operators.StringJoins]]' exact
  * edit-distance join (Levenshtein counts edits; Jaro–Winkler scores
  * agreement with a prefix bias, the record-linkage convention). One
  * compiled O(len·window) pass per row.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects two STRING columns, got ${l.catalogString}, ${r.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (aC, bC) =>
      s"graft.functions.JaroWinklerImpl.similarity($aC, $bC)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
