package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Count-Min gate's structural guarantee, beyond the hash gate's
  * value-exactness: CMS error is ONE-SIDED — a point estimate can only
  * overcount (bucket collisions add, never subtract), so est ≥ exact for
  * every (lang, probe), including zero-count probes (est ≥ 0 = exact).
  */
class CmsFreqSpec extends AnyFunSuite with SparkSpec {
  test("CMS point estimates dominate exact counts (one-sided error)") {
    val rows = SparkEntry.queries("q_cms_freq")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3),
        s"CMS must never undercount: est=${r.getLong(2)} < exact=${r.getLong(3)} in $r")
    }
    // the fixture must exercise BOTH probe classes: present tokens (the
    // estimate has something to overcount) and absent ones (exact = 0)
    assert(rows.exists(_.getLong(3) > 0) && rows.exists(_.getLong(3) == 0))
  }
}
