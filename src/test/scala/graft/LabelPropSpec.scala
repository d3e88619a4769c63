package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** Synchronous majority-vote label propagation against a driver-side
  * reference simulation: fixed rounds, ties to the minimum label, labels a
  * pure function of the edge set (duplicate / reversed / self-loop edges
  * must not change votes).
  */
class LabelPropSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Reference: synchronous rounds over the deduplicated undirected
    * neighbor sets, argmax by (count desc, label asc).
    */
  private def reference(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    val nbrs = und.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var labels = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to k) {
      labels = nbrs.map { case (n, ns) =>
        val votes = ns.groupBy(labels).map { case (l, xs) => l -> xs.size }
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  private def run(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    GraphOps.labelPropagation(edges.toDF("a", "b"), "a", "b", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques joined by a bridge converge to two communities") {
    val cliqueA = for (i <- 1L to 5L; j <- 1L to 5L if i < j) yield (i, j)
    val cliqueB = for (i <- 11L to 15L; j <- 11L to 15L if i < j) yield (i, j)
    val edges = cliqueA ++ cliqueB ++ Seq((5L, 11L))
    val got = run(edges, 4)
    assert(got == reference(edges, 4))
    // Everyone in clique A (and the bridge endpoints' own sides) carries
    // A's minimum; clique B likewise.
    assert((1L to 5L).forall(n => got(n) == 1L))
    assert((12L to 15L).forall(n => got(n) == 11L))
  }

  test("random graphs with noise edges ≡ reference simulation") {
    val rng = new scala.util.Random(23)
    for (trial <- 0 until 3) {
      val base = Seq.fill(300)(
        (rng.nextInt(120).toLong, rng.nextInt(120).toLong))
      val edges = base ++ base.take(40).map(_.swap) ++ // reversed dups
        Seq((3L, 3L), (80L, 80L)) // self-loops must be ignored
      for (k <- Seq(1, 3)) {
        assert(run(edges, k) == reference(edges, k), s"trial=$trial k=$k")
      }
    }
  }
}
