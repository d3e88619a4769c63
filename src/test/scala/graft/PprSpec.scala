package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** Personalized integer PageRank against a driver-side simulation of the
  * exact BIGINT recurrence: restart mass only on seeds, floor-division
  * shares, every graph node reported each round (zero-mass rows included).
  */
class PprSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def reference(
      edges: Seq[(Long, Long)], seeds: Set[Long], k: Int,
      scale: Long): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2).flatMap(e => Seq(e, e.swap)).distinct
    val nbrs = und.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    val deg = nbrs.map { case (n, ns) => n -> ns.size.toLong }
    val base = 3L * scale / 20L
    var pr = nbrs.keys.map(n => n -> (if (seeds(n)) scale else 0L)).toMap
    for (_ <- 1 to k) {
      val shares = nbrs.keys.map { n => n ->
        nbrs.keys.toSeq.filter(u => nbrs(u).contains(n))
          .map(u => (pr(u) * 17L) / (20L * deg(u))).sum
      }.toMap
      pr = shares.map { case (n, s) => n -> ((if (seeds(n)) base else 0L) + s) }
    }
    pr
  }

  test("two-community graph: mass concentrates near the seeded side; exact integers") {
    val cliqueA = for (i <- 1L to 5L; j <- 1L to 5L if i < j) yield (i, j)
    val cliqueB = for (i <- 11L to 15L; j <- 11L to 15L if i < j) yield (i, j)
    val edges = cliqueA ++ cliqueB ++ Seq((5L, 11L), (3L, 3L)) // bridge + self-loop
    val seeds = Set(1L, 2L)
    val got = GraphOps.personalizedPageRankInt(
        edges.toDF("a", "b"), "a", "b",
        seeds.toSeq.toDF("s"), "s", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == reference(edges, seeds, 4, 1000000000000L))
    // diffusion sanity: a seeded-clique member outranks the far clique
    assert(got(3L) > got(13L))
  }

  test("random graphs ≡ reference; seeds outside the edge set are ignored") {
    val rng = new scala.util.Random(29)
    val edges = Seq.fill(250)((rng.nextInt(80).toLong, rng.nextInt(80).toLong))
    val seeds = Set(0L, 7L, 40L, 999999L) // last one is not a graph node
    val got = GraphOps.personalizedPageRankInt(
        edges.toDF("a", "b"), "a", "b",
        seeds.toSeq.toDF("s"), "s", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = reference(edges, seeds, 3, 1000000000000L)
    assert(got == want)
    assert(!got.contains(999999L), "an isolated seed must not appear")
  }
}
