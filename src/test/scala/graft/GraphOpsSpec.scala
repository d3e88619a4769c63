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

  test("round-0 states that are stars rooted at a NON-minimum still relabel (r14 fix)") {
    // A raw input can be disjoint-star-SHAPED with edges pointing
    // small → large — structurally clean under the pre-fix convergence
    // check, but rooted wrong. Both the endgame (cap > 0) and the pure
    // distributed path (cap = 0) must label with the minimum.
    for (cap <- Seq(0, 1 << 17)) {
      assert(ccOf(Seq((1L, 2L)), localCap = cap) === Map(1L -> 1L, 2L -> 1L),
        s"single edge, cap=$cap")
      assert(ccOf(Seq((1L, 2L), (3L, 2L)), localCap = cap) ===
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"mis-rooted star, cap=$cap")
    }
  }

  test("incrementalComponents ≡ from-scratch CC across random splits") {
    val rng = new scala.util.Random(23)
    // Random graph with chains and a hub so merges via bridges, brand-new
    // components, and label takeovers by smaller new ids all occur.
    val all = Seq.fill(300)((rng.nextInt(200).toLong + 100L, rng.nextInt(200).toLong + 100L)) ++
      (500L until 540L).map(i => (i, i + 1)) ++
      (1L to 20L).map(i => (700L, 700L + i)) ++
      Seq((5L, 120L)) // a NEW node with a smaller id than its component min
    for (seed <- Seq(1, 2, 3)) {
      val r2 = new scala.util.Random(seed)
      val (oldE, newE) = all.partition(_ => r2.nextBoolean())
      val labels = GraphOps.connectedComponents(oldE.toDF("a", "b"), "a", "b")
      val incr = GraphOps.incrementalComponents(labels, "node", "component",
          newE.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(incr == unionFind(all ++ Seq.empty), s"split seed $seed diverged")
      assert(incr.size == incr.keySet.size)
    }
  }

  test("incrementalComponents: internal-only new edges leave the labeling unchanged") {
    // Every "new" edge lands inside an existing component — the quotient
    // graph is empty and the old labels must pass through untouched.
    val oldE = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val labels = GraphOps.connectedComponents(oldE.toDF("a", "b"), "a", "b")
    val incr = GraphOps.incrementalComponents(labels, "node", "component",
        Seq((1L, 3L), (10L, 11L)).toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incr == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("incrementalComponents: a new batch can be entirely new nodes") {
    val labels = GraphOps.connectedComponents(Seq((1L, 2L)).toDF("a", "b"), "a", "b")
    val incr = GraphOps.incrementalComponents(labels, "node", "component",
        Seq((50L, 51L), (51L, 52L)).toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incr == Map(1L -> 1L, 2L -> 1L, 50L -> 50L, 51L -> 50L, 52L -> 50L))
  }

  test("non-integral node ids are rejected") {
    val strIds = Seq(("a", "b")).toDF("u", "v")
    assertThrows[IllegalArgumentException](
      GraphOps.connectedComponents(strIds, "u", "v"))
  }

  // ---- bfsDistances ------------------------------------------------------

  /** Ground truth: plain queue BFS over the undirected simple graph. */
  private def bruteBfs(edges: Seq[(Long, Long)], sources: Set[Long],
      maxHops: Int): Map[Long, Int] = {
    val adj = edges.filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val dist = scala.collection.mutable.Map(sources.toSeq.map(_ -> 0): _*)
    var frontier = sources
    for (h <- 1 to maxHops) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .filterNot(dist.contains)
      frontier.foreach(n => dist(n) = h)
    }
    dist.toMap
  }

  test("bfsDistances ≡ queue BFS on a random graph, all hop bounds") {
    val rng = new scala.util.Random(29)
    val edges = Seq.tabulate(300)(_ =>
      (rng.nextInt(120).toLong, rng.nextInt(120).toLong)) ++
      (200L until 210L).map(i => (i, i + 1)) // a chain off to the side
    val sources = Set(0L, 7L, 200L)
    val df = edges.toDF("a", "b")
    val src = sources.toSeq.toDF("id")
    for (k <- Seq(0, 1, 3, 6)) {
      val got = GraphOps.bfsDistances(df, "a", "b", src, "id", k)
        .as[(Long, Int)].collect().toMap
      assert(got === bruteBfs(edges, sources, k), s"maxHops=$k")
    }
  }

  test("bfsDistances: a source off the graph keeps distance 0 of itself only") {
    val got = GraphOps.bfsDistances(
        Seq((1L, 2L)).toDF("a", "b"), "a", "b",
        Seq(99L).toDF("id"), "id", 3)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(99L -> 0))
  }

  // ---- pageRankInt -------------------------------------------------------

  /** Ground truth: the same integer recurrence, computed sequentially. */
  private def brutePageRank(edges: Seq[(Long, Long)], iters: Int,
      scale: Long): Map[Long, Long] = {
    val und = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val base = 3L * scale / 20L
    var pr = adj.keys.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val next = scala.collection.mutable.Map[Long, Long]()
      for ((u, vs) <- adj; share = pr(u) * 17L / (20L * vs.size); v <- vs)
        next(v) = next.getOrElse(v, 0L) + share
      pr = next.iterator.map { case (n, s) => n -> (base + s) }.toMap
    }
    pr
  }

  test("pageRankInt ≡ sequential integer recurrence on a random graph") {
    val rng = new scala.util.Random(31)
    val edges = Seq.tabulate(400)(_ =>
      (rng.nextInt(100).toLong, rng.nextInt(100).toLong))
    for (k <- Seq(1, 3, 5)) {
      val got = GraphOps.pageRankInt(edges.toDF("a", "b"), "a", "b", k)
        .as[(Long, Long)].collect().toMap
      assert(got === brutePageRank(edges, k, 1000000000000L), s"iters=$k")
    }
  }

  test("streamComponents: micro-batch fold ≡ from-scratch CC, cross-batch merges included") {
    // Components that only exist ACROSS batches: batch 1 builds {1,2} and
    // {3,4} separately, batch 2's (2,3) fuses them; batch 3 adds brand-new
    // nodes AND another fuse (4,5) — the shapes that break a per-key-state
    // formulation.
    val batches = Seq(
      Seq((1L, 2L), (3L, 4L), (10L, 11L)),
      Seq((2L, 3L), (20L, 21L)),
      Seq((4L, 5L), (30L, 31L), (11L, 20L)))
    // Flat part-files: the file-stream source lists FILES under the path,
    // not nested dataset directories (the Staging layout convention).
    val staged = java.nio.file.Files.createTempDirectory("graft_streamcc").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      val tmp = s"$staged/stage$i"
      b.toDF("u", "v").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(staged, s"b$i.parquet"))
      // Modification-time ordering drives replay order.
      java.nio.file.Paths.get(staged, s"b$i.parquet").toFile
        .setLastModified(System.currentTimeMillis() - 10000 + i * 1000)
    }
    val src = spark.readStream
      .schema(spark.read.parquet(s"$staged/b0.parquet").schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val (q, labels) = GraphOps.streamComponents(src, "u", "v")
    try q.processAllAvailable() finally q.stop()
    val got = labels().as[(Long, Long)].collect().toMap
    val want = GraphOps.connectedComponents(
      batches.flatten.toDF("u", "v"), "u", "v")
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    // The cross-batch fusions actually happened: 1–5 one component, the
    // batch-1 pair 10/11 fused with batch-2's 20/21 via batch-3's (11,20).
    assert(Seq(1L, 2L, 3L, 4L, 5L).map(got).toSet.size === 1)
    assert(Seq(10L, 11L, 20L, 21L).map(got).toSet.size === 1)
    assert(got(30L) === got(31L))
    assert(got(30L) !== got(1L))
  }

  test("pageRankInt: a hub out-ranks leaves and ranks are partition-stable") {
    // star: hub 0 with 20 leaves, plus a detached pair
    val edges = (1L to 20L).map(i => (0L, i)) :+ (100L, 101L)
    val df = edges.toDF("a", "b").repartition(7)
    val pr = GraphOps.pageRankInt(df, "a", "b", 5).as[(Long, Long)]
      .collect().toMap
    assert(pr(0L) > pr(1L))
    assert((1L to 20L).map(pr).toSet.size === 1) // leaves identical
    val again = GraphOps.pageRankInt(df.repartition(3), "a", "b", 5)
      .as[(Long, Long)].collect().toMap
    assert(pr === again)
  }

  /** Ground truth for kCore: sequential peeling to the fixpoint. */
  private def bruteKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    var changed = true
    while (changed) {
      val deg = und.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val dead = deg.filter(_._2 < k).keySet
      changed = dead.nonEmpty
      und = und.filterNot(e => dead(e._1) || dead(e._2))
    }
    und.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
  }

  test("kCore: triangle survives the 2-core, the pendant is peeled") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val got = GraphOps.kCore(e, "a", "b", kMin = 2)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: a path has no 2-core — peels from the ends to empty") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    assert(GraphOps.kCore(e, "a", "b", kMin = 2).isEmpty)
    // and the maxRounds guard throws instead of silently stopping short
    val err = intercept[IllegalStateException] {
      GraphOps.kCore(e, "a", "b", kMin = 2, maxRounds = 1).collect()
    }
    assert(err.getMessage.contains("did not converge"))
  }

  test("kCore ≡ sequential peeling on the fixture customer graph (k=10)") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_custkey")
    val edges = o.as("a")
      .join(o.as("b"), $"a.o_orderkey" + 1 === $"b.o_orderkey")
      .select($"a.o_custkey".as("c1"), $"b.o_custkey".as("c2"))
    val raw = edges.as[(Long, Long)].collect().toSeq
    val expect = bruteKCore(raw, 10)
    val (core, rounds) = GraphOps.kCoreWithRounds(edges, "c1", "c2", 10, 100)
    val got = core.as[(Long, Long)].collect().toMap
    assert(got === expect)
    // the q_kcore oracle unrolls 8 rounds — convergence must stay within
    assert(rounds <= 8, s"peeling took $rounds rounds; oracle depth is 8")
  }

  test("kCore handles duplicate/reversed/self-loop edges and is partition-stable") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 3L), (3L, 4L)).toDF("a", "b")
    val a = GraphOps.kCore(e.repartition(5), "a", "b", 2)
      .as[(Long, Long)].collect().toMap
    val b = GraphOps.kCore(e.coalesce(1), "a", "b", 2)
      .as[(Long, Long)].collect().toMap
    assert(a === Map(1L -> 2L, 2L -> 2L, 3L -> 2L) && a === b)
  }
}
