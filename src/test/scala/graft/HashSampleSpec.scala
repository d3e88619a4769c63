package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{HashSampleBuffer, HashSampleValues}
import graft.operators.{Sketches, TextOps}

/** Bottom-k-by-hash value sample: set semantics of the bounded pair buffer
  * (duplicate hashes keep the MINIMUM value), the exact path below k,
  * merge/serialize laws, invariance under repartitioning, and the
  * positional quantile readout against a driver-side reference.
  */
class HashSampleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Reference: distinct hashes with min value, k smallest by hash, values
    * sorted ascending.
    */
  private def refSample(pairs: Seq[(Long, Long)], k: Int): Seq[Long] =
    pairs.groupBy(_._1).view.mapValues(_.map(_._2).min).toSeq
      .sortBy(_._1).take(k).map(_._2).sorted

  /** Driver-side twin of [[TextOps.polyHash]] for building fixtures. */
  private def ph(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31L + c.toLong) % 1000000007L)

  test("buffer keeps the pairs of the k smallest DISTINCT hashes; dup hash keeps min value") {
    val b = new HashSampleBuffer(3)
    Seq((50L, 500L), (10L, 100L), (30L, 300L), (20L, 200L), (50L, 499L))
      .foreach { case (h, v) => b.insert(h, v) }
    assert(b.n === 3)
    assert(b.hashes.take(3).toSeq === Seq(10L, 20L, 30L))
    assert(b.vals.take(3).toSeq === Seq(100L, 200L, 300L))
    // equal hash on a FULL buffer still applies the min-value rule
    b.insert(30L, 7L)
    assert(b.vals.take(3).toSeq === Seq(100L, 200L, 7L))
    // above the max of a full buffer: ignored
    b.insert(99L, 1L)
    assert(b.hashes.take(3).toSeq === Seq(10L, 20L, 30L))
  }

  test("merge equals the single-pass buffer for any split; serialize round-trips") {
    val rng = new scala.util.Random(13)
    val pairs = Vector.fill(300)((rng.nextInt(120).toLong, rng.nextInt(1000).toLong))
    val (l, r) = pairs.splitAt(111)
    val one = new HashSampleBuffer(16)
    pairs.foreach { case (h, v) => one.insert(h, v) }
    val a = new HashSampleBuffer(16); l.foreach { case (h, v) => a.insert(h, v) }
    val c = new HashSampleBuffer(16); r.foreach { case (h, v) => c.insert(h, v) }
    val lit = org.apache.spark.sql.catalyst.expressions.Literal(1L)
    val agg = HashSampleValues(lit, lit, 16)
    val merged = agg.merge(a, c)
    assert(merged.hashes.take(merged.n).toSeq === one.hashes.take(one.n).toSeq)
    assert(merged.vals.take(merged.n).toSeq === one.vals.take(one.n).toSeq)
    val rt = agg.deserialize(agg.serialize(merged))
    assert(rt.n === merged.n &&
      rt.hashes.take(rt.n).toSeq === merged.hashes.take(merged.n).toSeq &&
      rt.vals.take(rt.n).toSeq === merged.vals.take(merged.n).toSeq)
  }

  test("property: any split/merge tree equals the single-pass buffer (100 random trials)") {
    // The set-function law that makes the sample oracle-gateable: for ANY
    // partition of the input into sub-buffers merged in ANY order, the
    // result equals one pass over the whole input. Random k, random data
    // (hash collisions forced by a small hash domain), random 3-way splits.
    val lit = org.apache.spark.sql.catalyst.expressions.Literal(1L)
    for (trial <- 0 until 100) {
      val rng = new scala.util.Random(1000 + trial)
      val k = 2 + rng.nextInt(20)
      val n = rng.nextInt(200)
      val pairs = Vector.fill(n)(
        (rng.nextInt(40).toLong, rng.nextInt(1000).toLong))
      val one = new HashSampleBuffer(k)
      pairs.foreach { case (h, v) => one.insert(h, v) }
      val cut1 = if (n == 0) 0 else rng.nextInt(n + 1)
      val cut2 = if (n == 0) 0 else cut1 + rng.nextInt(n - cut1 + 1)
      val parts = Seq(pairs.slice(0, cut1), pairs.slice(cut1, cut2),
        pairs.slice(cut2, n)).map { p =>
        val b = new HashSampleBuffer(k)
        p.foreach { case (h, v) => b.insert(h, v) }
        b
      }
      val agg = HashSampleValues(lit, lit, k)
      val l2r = parts.reduceLeft(agg.merge)
      assert(l2r.hashes.take(l2r.n).toSeq === one.hashes.take(one.n).toSeq &&
        l2r.vals.take(l2r.n).toSeq === one.vals.take(one.n).toSeq,
        s"trial $trial (k=$k, n=$n, cuts=$cut1/$cut2)")
    }
  }

  test("aggregate matches the reference sample across partitionings") {
    val rng = new scala.util.Random(29)
    val pairs = Vector.fill(500)((rng.nextInt(200).toLong, rng.nextInt(10000).toLong))
    val expect = refSample(pairs, 32)
    for (parts <- Seq(1, 7, 32)) {
      val got = pairs.toDF("h", "v").repartition(parts)
        .agg(Sketches.sampleQuantiles($"h", $"v", 32, Seq(50)).as("sq"))
        .select($"sq.n_sample").collect()(0).getInt(0)
      assert(got === expect.length)
      val sample = pairs.toDF("h", "v").repartition(parts)
        .agg(org.apache.spark.sql.graft.bridge.column(
          HashSampleValues(
            org.apache.spark.sql.graft.bridge.expression($"h"),
            org.apache.spark.sql.graft.bridge.expression($"v"), 32)
            .toAggregateExpression()).as("s"))
        .collect()(0).getSeq[Long](0)
      assert(sample === expect, s"parts=$parts")
    }
  }

  test("below k the sample IS the data: quantiles are the exact nearest-rank values") {
    val vals = Seq(10L, 40L, 20L, 30L, 50L)
    val df = vals.zipWithIndex
      .map { case (v, i) => (ph(s"row$i"), v) }
      .toDF("h", "v")
    val r = df.agg(Sketches.sampleQuantiles($"h", $"v", 64, Seq(0, 50, 100)).as("sq"))
      .select($"sq.n_sample", $"sq.p0", $"sq.p50", $"sq.p100").collect()(0)
    assert(r.getInt(0) === 5)
    assert(r.getLong(1) === 10L && r.getLong(2) === 30L && r.getLong(3) === 50L)
  }

  test("sample quantiles land near the true quantiles on a known distribution") {
    // 20k rows, values 0..9999 duplicated — true quantiles are p/100*10000.
    // Keys are constant-length and long enough that the polynomial hash
    // wraps the modulus many times (short sequential strings like "key7"
    // never wrap and sort their hashes by length — the non-uniformity the
    // KMV spec documents); uniformity is the estimator's contract.
    val df = (0 until 20000)
      .map(i => (ph(f"document-$i%07d-quantile-salt"), (i % 10000).toLong))
      .toDF("h", "v")
    val r = df.agg(Sketches.sampleQuantiles($"h", $"v", 256, Seq(25, 50, 75)).as("sq"))
      .select($"sq.p25", $"sq.p50", $"sq.p75").collect()(0)
    for ((p, i) <- Seq(25, 50, 75).zipWithIndex) {
      val tru = p * 100.0
      val got = r.getLong(i).toDouble
      assert(math.abs(got - tru) < 1500.0,
        s"p$p estimate $got too far from $tru (k=256, ~√k error expected)")
    }
  }

  test("nulls are skipped; bad parameters rejected") {
    val r = Seq[(Option[Long], Option[Long])]((None, Some(1L)), (Some(1L), None))
      .toDF("h", "v")
      .agg(Sketches.sampleQuantiles($"h", $"v", 4, Seq(50)).as("sq"))
      .select($"sq.n_sample").collect()(0)
    assert(r.getInt(0) === 0)
    val one = org.apache.spark.sql.catalyst.expressions.Literal(1L)
    intercept[IllegalArgumentException](HashSampleValues(one, one, 1))
    intercept[IllegalArgumentException](
      Sketches.sampleQuantiles(lit(1L), lit(1L), 4, Seq(101)))
  }
}
