package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

class TriangleCountSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): (Long, Long, Long) =
    GraphOps.triangleCount(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].head()

  private def brute(edges: Seq[(Long, Long)]): Long = {
    val es = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    (for {
      a <- nodes; b <- nodes if a < b && es((a, b))
      c <- nodes if b < c && es((b, c)) && es((a, c))
    } yield 1).size.toLong
  }

  test("K5 has exactly C(5,3) = 10 triangles") {
    val k5 = for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)
    assert(count(k5) === ((5L, 10L, 10L)))
  }

  test("bipartite graphs are triangle-free") {
    val bip = for (i <- 0L until 4L; j <- 10L until 14L) yield (i, j)
    assert(count(bip)._3 === 0L)
  }

  test("self-loops, duplicates, and reversed edges are ignored") {
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L))
    assert(count(tri) === ((3L, 3L, 1L)))
  }

  test("random graphs match brute force, including skewed hubs") {
    val rnd = new scala.util.Random(7)
    // a hub (node 0 connects to everything) plus random background edges
    val hub = (1L until 30L).map(i => (0L, i))
    val rest = Seq.fill(120)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val edges = hub ++ rest
    assert(count(edges)._3 === brute(edges))
  }
}
