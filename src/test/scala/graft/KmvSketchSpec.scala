package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{KmvBuffer, KmvSketch}
import graft.operators.{Sketches, TextOps}

/** KMV distinct-count sketch: set semantics of the bounded buffer, exactness
  * below k, the estimator formula, merge/serialize laws, and — the property
  * that makes it oracle-checkable — invariance of the result under
  * partitioning (map-side partial merges).
  */
class KmvSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("buffer keeps the k smallest DISTINCT values, sorted") {
    val b = new KmvBuffer(4)
    Seq(50L, 10L, 50L, 30L, 20L, 40L, 5L, 10L).foreach(b.insert)
    assert(b.n === 4)
    assert(b.mins.take(4).toSeq === Seq(5L, 10L, 20L, 30L))
    // a value above the current max of a full buffer is ignored
    b.insert(99L)
    assert(b.mins.take(4).toSeq === Seq(5L, 10L, 20L, 30L))
  }

  test("merge is the bounded union — order of operations irrelevant") {
    val vals = new scala.util.Random(11).shuffle((1L to 100L).toVector)
    val (l, r) = vals.splitAt(37)
    val one = new KmvBuffer(8); vals.foreach(one.insert)
    val a = new KmvBuffer(8); l.foreach(a.insert)
    val c = new KmvBuffer(8); r.foreach(c.insert)
    val sk = KmvSketch(org.apache.spark.sql.catalyst.expressions.Literal(1L), 8, 1000L)
    val merged = sk.merge(a, c)
    assert(merged.mins.take(8).toSeq === one.mins.take(8).toSeq)
    val rt = sk.deserialize(sk.serialize(merged))
    assert(rt.n === merged.n && rt.mins.take(rt.n).toSeq === merged.mins.take(merged.n).toSeq)
  }

  test("fewer than k distinct values: exact count, kth = max seen") {
    val r = Seq(1L, 2L, 2L, 3L).toDF("h")
      .agg(Sketches.kmvDistinct($"h", 64, 1000L).as("s"))
      .select($"s.n_min", $"s.kth_hash", $"s.estimate").collect()(0)
    assert(r.getInt(0) === 3 && r.getLong(1) === 3L && r.getDouble(2) === 3.0)
  }

  test("estimator: (k-1)*range/h_k, and it lands near the truth") {
    val n = 20000
    // uniform on [0, Prime) by construction — the estimator's contract.
    // (Structured inputs, e.g. polynomial hashes of sequential strings,
    // are measurably non-uniform at the low end; real pipelines hash
    // free-form text, which behaves like this fixture.)
    val rng = new scala.util.Random(7)
    val distinct = Seq.fill(n)(math.floorMod(rng.nextLong(), TextOps.Prime)).distinct
    val df = distinct.toDF("h")
    val r = df.agg(Sketches.kmvDistinct($"h", 256).as("s"))
      .select($"s.kth_hash", $"s.estimate").collect()(0)
    val expected = 255.0 * TextOps.Prime.toDouble / r.getLong(0).toDouble
    assert(r.getDouble(1) === expected)
    val err = math.abs(r.getDouble(1) - distinct.size) / distinct.size
    assert(err < 0.2, s"estimate ${r.getDouble(1)} too far from ${distinct.size}")
  }

  test("result is invariant under repartitioning (partial merges)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(TextOps.polyHash($"text").as("h"), $"lang")
    def sketch(parts: Int) =
      docs.repartition(parts).groupBy($"lang")
        .agg(Sketches.kmvDistinct($"h", 16).as("s"))
        .select($"lang", $"s.n_min", $"s.kth_hash", $"s.estimate")
        .collect().map(_.toSeq).toSet
    assert(sketch(1) === sketch(7) && sketch(7) === sketch(32))
  }

  test("nulls are skipped, empty group evaluates to the zero sketch") {
    val r = Seq[Option[Long]](None, None).toDF("h")
      .agg(Sketches.kmvDistinct($"h", 4, 100L).as("s"))
      .select($"s.n_min", $"s.kth_hash", $"s.estimate").collect()(0)
    assert(r.getInt(0) === 0 && r.getLong(1) === 0L && r.getDouble(2) === 0.0)
  }

  test("bad parameters rejected") {
    intercept[IllegalArgumentException](
      KmvSketch(org.apache.spark.sql.catalyst.expressions.Literal(1L), 1, 100L))
    intercept[IllegalArgumentException](
      KmvSketch(org.apache.spark.sql.catalyst.expressions.Literal(1L), 4, 1L << 60))
  }
}
