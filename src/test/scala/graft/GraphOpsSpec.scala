package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** Connected-components correctness: the star-contraction iteration must
  * label every node with its component's minimum id — checked against a
  * driver-side union-find ground truth on fixtures engineered for the
  * algorithm's failure modes (long chains needing multiple rounds, hub
  * stars, duplicate/reversed/self-loop edges).
  */
class GraphOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Ground truth: union-find where the smaller root always wins, so each
    * final root IS the component minimum.
    */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val real = edges.filter { case (a, b) => a != b }
    val nodes = real.flatMap { case (a, b) => Seq(a, b) }.toSet
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n).toSeq: _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    for ((a, b) <- real) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.iterator.map(n => n -> find(n)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)], maxIter: Int = 50,
      localCap: Int = 1 << 17): Map[Long, Long] = {
    val rows = GraphOps.connectedComponents(
      edges.toDF("a", "b"), "a", "b", maxIter, localCap).collect()
    val m = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == m.size, "a node must carry exactly one label")
    m
  }

  test("random graph + 64-chain + hub star + noise edges ≡ union-find") {
    val rng = new scala.util.Random(17)
    val random = Seq.fill(400)((rng.nextInt(300).toLong, rng.nextInt(300).toLong))
    val chain = (900L until 963L).map(i => (i + 1, i)) // reversed orientation
    val hub = (1L to 40L).map(i => (500L, 500L + i))
    val edges = random ++ chain ++ hub ++
      random.take(50).map(_.swap) ++ // duplicate reversed edges
      Seq((7L, 7L), (999999L, 999999L)) // self-loops (second: isolated node)
    assert(ccOf(edges) == unionFind(edges))
  }

  test("distributed star rounds ≡ local endgame on random graphs") {
    // The endgame cap must be a pure performance knob: labels from the
    // all-distributed path (cap 0) and the endgame path (cap larger than
    // the graph) must agree exactly — on shapes that need several rounds.
    for (seed <- Seq(3, 29, 71)) {
      val rng = new scala.util.Random(seed)
      val edges = Seq.fill(300)((rng.nextInt(500).toLong, rng.nextInt(500).toLong)) ++
        (2000L until 2040L).map(i => (i + 1, i))
      val dist = ccOf(edges, localCap = 0)
      val local = ccOf(edges, localCap = 1 << 17)
      assert(dist == local, s"seed=$seed")
      assert(dist == unionFind(edges), s"seed=$seed")
    }
  }

  test("endgame engages mid-contraction when rounds shrink a big graph under the cap") {
    // Cap smaller than the input edge count but larger than the one-round
    // contraction: the first stateCheck sees too many edges, iterates once,
    // then finishes locally — exercising the round→endgame handoff.
    val hub = (1L to 200L).map(i => (0L, i)) ++ (1L to 200L).map(i => (i, i + 200L))
    val got = ccOf(hub, localCap = 250)
    assert(got == unionFind(hub))
  }

  test("two planted components never merge; labels are the minima") {
    val a = Seq((10L, 11L), (11L, 12L), (12L, 13L))
    val b = Seq((20L, 21L), (22L, 21L))
    val got = ccOf(a ++ b)
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("empty and self-loop-only inputs yield no rows") {
    assert(ccOf(Seq.empty) == Map.empty)
    assert(ccOf(Seq((5L, 5L))) == Map.empty)
  }

  test("insufficient maxIter throws instead of returning a partial labeling") {
    // localCap 0: the endgame would otherwise absorb any small fixture
    // before maxIter could bite.
    val chain = (0L until 63L).map(i => (i, i + 1))
    assertThrows[IllegalStateException](ccOf(chain, maxIter = 1, localCap = 0))
  }

  test("non-integral node ids are rejected") {
    val strIds = Seq(("a", "b")).toDF("u", "v")
    assertThrows[IllegalArgumentException](
      GraphOps.connectedComponents(strIds, "u", "v"))
  }
}
