package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** `SparkSessionExtensions` installer for graft's custom expressions, so SQL
  * users get them too:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT graft_poly_hash(text) FROM docs")       // base 31
  * spark.sql("SELECT graft_poly_hash(text, 131) FROM docs")  // explicit base
  * }}}
  *
  * (Library callers use [[graft.operators.TextOps.polyHash]] directly; this
  * is the SQL-frontend registration path — `spark.sql.extensions` config or
  * `withExtensions`.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      (children: Seq[Expression]) => children match {
        case Seq(s) => PolyHash(s, 31L)
        case Seq(s, Literal(base: Long, _)) => PolyHash(s, base)
        case Seq(s, Literal(base: Int, _))  => PolyHash(s, base.toLong)
        case _ => throw new IllegalArgumentException(
          "graft_poly_hash(str[, base]) expects a string and an optional integer literal base")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_char_shingles"),
      new ExpressionInfo(classOf[CharShingles].getName, "graft_char_shingles"),
      (children: Seq[Expression]) => children match {
        case Seq(s) => CharShingles(s, 3)
        case Seq(s, Literal(n: Int, _))  => CharShingles(s, n)
        case Seq(s, Literal(n: Long, _)) => CharShingles(s, n.toInt)
        case _ => throw new IllegalArgumentException(
          "graft_char_shingles(str[, n]) expects a string and an optional integer literal width")
      }))
  }
}
