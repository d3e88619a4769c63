package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotStore

/** [[SnapshotStore]]'s transactional contract: atomic publish, orphan
  * invisibility, time travel, vacuum GC — the properties the q_snapshot_read
  * gate's one read cannot pin alone.
  */
class SnapshotStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def freshDir() =
    Files.createTempDirectory("graft_snap").toString

  test("publish/read identity and monotonic versions") {
    val dir = freshDir()
    val v1 = (1 to 10).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    assert(SnapshotStore.publish(v1, dir) == 1)
    val v2 = v1.filter($"id" <= 4)
    assert(SnapshotStore.publish(v2, dir) == 2)
    assert(SnapshotStore.versions(spark, dir) == Seq(1, 2))
    assert(SnapshotStore.read(spark, dir).count() == 4)
    assert(SnapshotStore.read(spark, dir, Some(1))
      .orderBy($"id").as[(Long, String)].collect().toSeq ==
      (1 to 10).map(i => (i.toLong, s"row$i")))
  }

  test("orphans from a crashed writer are invisible to every version") {
    val dir = freshDir()
    val d = (1 to 6).map(i => (i.toLong, i * 10L)).toDF("id", "v")
    SnapshotStore.publish(d, dir)
    // a crashed job's output: data files with no manifest
    (100 to 105).map(i => (i.toLong, 0L)).toDF("id", "v")
      .write.parquet(s"$dir/data/crashed-abc")
    assert(SnapshotStore.read(spark, dir).agg(max($"id")).as[Long].head() == 6L)
    SnapshotStore.publish(d.filter($"id" <= 2), dir)
    assert(SnapshotStore.read(spark, dir).count() == 2)
    assert(SnapshotStore.read(spark, dir, Some(1)).count() == 6)
  }

  test("vacuum deletes orphans and superseded files; the kept version still reads") {
    val dir = freshDir()
    val d = (1 to 8).map(i => (i.toLong, s"x$i")).toDF("id", "s")
    SnapshotStore.publish(d, dir)
    (200 to 220).map(i => (i.toLong, "junk")).toDF("id", "s")
      .write.parquet(s"$dir/data/crashed-xyz")
    SnapshotStore.publish(d.filter($"id" % 2 === 0), dir)
    val deleted = SnapshotStore.vacuum(spark, dir, keepVersions = 1)
    assert(deleted > 0, "v1 files + orphans must be deleted")
    assert(SnapshotStore.versions(spark, dir) == Seq(2))
    assert(SnapshotStore.read(spark, dir).count() == 4)
    intercept[IllegalArgumentException](
      SnapshotStore.read(spark, dir, Some(1)))
    // idempotent: nothing left to collect
    assert(SnapshotStore.vacuum(spark, dir, keepVersions = 1) == 0)
  }

  test("the commit right is durable: a committed version's lock still blocks " +
    "a late same-version claimant after the tmp name freed (r17 ADVICE)") {
    // The lost-update race: two publishers compute next = 1; the winner
    // publishes (its rename FREES the tmp name). Under the old
    // tmp-keyed design the slow loser's exclusive create of the same tmp
    // then SUCCEEDED and its rename silently replaced manifest-v1.txt.
    // The never-renamed manifest-v1.lock is the fix — pin that the
    // loser's arbitration step (exclusive lock create) throws even
    // though the tmp name is free, with the winner's manifest intact.
    val dir = freshDir()
    val d = (1 to 4).map(i => (i.toLong, s"r$i")).toDF("id", "s")
    SnapshotStore.publish(d, dir)
    val lock = new org.apache.hadoop.fs.Path(dir, "manifest-v1.lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(lock), "publish must leave the durable per-version lock")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "manifest-v1.txt.tmp")),
      "the tmp name must be free after commit — the race window under test")
    intercept[java.io.IOException](fs.create(lock, false).close())
    assert(SnapshotStore.read(spark, dir, Some(1)).count() == 4,
      "the winner's committed manifest must survive the loser's attempt")
  }

  test("same-version race, both orderings: a claimant against an IN-FLIGHT " +
    "holder fails loudly; two simultaneous publishers serialize to " +
    "contiguous committed versions (r18 VERDICT item 8)") {
    // Ordering B of the race (the r17 test above pins ordering A, where
    // the loser arrives AFTER the winner committed): here the loser
    // claims version 1 while the winner still HOLDS the lock, before any
    // manifest exists — step 1 must arbitrate, loudly, naming the lock.
    val dir = freshDir()
    val d = (1 to 4).map(i => (i.toLong, s"r$i")).toDF("id", "s")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    fs.create(new org.apache.hadoop.fs.Path(dir, "manifest-v1.lock"), false).close()
    val e = intercept[IllegalStateException](SnapshotStore.publish(d, dir))
    assert(e.getMessage.contains("lost the race") &&
      e.getMessage.contains("manifest-v1.lock"), e.getMessage)
    assert(SnapshotStore.versions(spark, dir).isEmpty,
      "the blocked claimant must leave nothing committed")

    // The live two-thread race, released through one barrier so both
    // claimants list versions() before either can commit. Legal outcomes:
    // both succeed (the slower thread saw the winner's commit and took
    // version 2 — a valid serialization) or the loser throws the race
    // error; illegal in every interleaving: a lost update (fewer
    // committed versions than successful publishes), a gap, or a
    // committed version whose rows are not exactly one publisher's input.
    val dir2 = freshDir()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentHashMap[Int, Either[Throwable, Int]]()
    // DISTINCT payloads (4 vs 7 rows) so a lost update is detectable by
    // CONTENT, not just by version arithmetic.
    val payloads = Seq(4, 7).map(n =>
      (1 to n).map(i => (i.toLong, s"r$i")).toDF("id", "s"))
    val threads = (0 until 2).map { i =>
      new Thread(() => {
        barrier.await()
        results.put(i,
          try Right(SnapshotStore.publish(payloads(i), dir2))
          catch { case t: Throwable => Left(t) })
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    val outcomes = (0 until 2).map(results.get)
    val wins = outcomes.zipWithIndex.collect { case (Right(v), i) => (v, i) }
    val losses = outcomes.collect { case Left(t) => t }
    assert(wins.nonEmpty, s"at least one publisher must commit; got $losses")
    losses.foreach(t => assert(t.isInstanceOf[IllegalStateException] &&
      t.getMessage.contains("lost the race"), s"unexpected loser error: $t"))
    assert(SnapshotStore.versions(spark, dir2) == (1 to wins.size),
      "committed versions must be exactly the successful publishes, contiguous")
    assert(wins.map(_._1).sorted == (1 to wins.size),
      s"returned versions must be distinct and contiguous, got ${wins.map(_._1)}")
    wins.foreach { case (v, i) =>
      assert(SnapshotStore.read(spark, dir2, Some(v)).count() ==
        Seq(4L, 7L)(i),
        s"version $v must read back exactly its publisher's payload")
    }
  }

  test("diff and schemaDrift resolve versions through the manifest layer") {
    val dir = freshDir()
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    SnapshotStore.publish(v1, dir)
    // v2: drops 1, changes 2, keeps 3, adds 4
    SnapshotStore.publish(
      Seq((2L, "B"), (3L, "c"), (4L, "d")).toDF("id", "s"), dir)
    val d12 = SnapshotStore.diff(spark, dir, 1, 2, Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(d12 == Map(1L -> "removed", 2L -> "changed",
      3L -> "unchanged", 4L -> "added"), s"got $d12")
    // direction matters: reversed versions flip added/removed
    val d21 = SnapshotStore.diff(spark, dir, 2, 1, Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(d21(1L) == "added" && d21(4L) == "removed")
    // schema evolution in v3: id retyped, s removed, n added
    SnapshotStore.publish(
      Seq(("2", 5L), ("3", 6L)).toDF("id", "n"), dir)
    val drift = SnapshotStore.schemaDrift(spark, dir, 1, 3)
      .as[(String, String, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(drift("id") == (("id", "retyped", Some("BIGINT"), Some("STRING"))))
    assert(drift("s") == (("s", "removed", Some("STRING"), None)))
    assert(drift("n") == (("n", "added", None, Some("BIGINT"))))
    assert(SnapshotStore.schemaDrift(spark, dir, 1, 1)
      .as[(String, String, Option[String], Option[String])]
      .collect().forall(_._2 == "unchanged"))
  }

  test("reading a fresh dir fails loudly; vacuum requires keeping one version") {
    val dir = freshDir()
    intercept[IllegalArgumentException](SnapshotStore.read(spark, dir))
    intercept[IllegalArgumentException](
      SnapshotStore.vacuum(spark, dir, keepVersions = 0))
    // vacuum of a dir that never existed is a harmless no-op, not an error
    assert(SnapshotStore.vacuum(spark, s"$dir/never-created") == 0)
  }

  test("lock+tmp+rename commit: a crashed publisher's debris is invisible, " +
    "blocks the same version loudly, and vacuum clears it") {
    val dir = freshDir()
    val d = (1 to 5).map(i => (i.toLong, s"r$i")).toDF("id", "s")
    assert(SnapshotStore.publish(d, dir) == 1)
    // Simulate a publisher of v2 that died after taking the lock,
    // mid-tmp-write (the new protocol's worst crash point).
    Files.write(java.nio.file.Paths.get(dir, "manifest-v2.lock"),
      Array.empty[Byte])
    Files.write(java.nio.file.Paths.get(dir, "manifest-v2.txt.tmp"),
      "half-written\n".getBytes("UTF-8"))
    // Readers are untouched: neither lock nor tmp is a committed version,
    // and the latest manifest still reads complete (the r16 ADVICE failure
    // mode — a visible-but-empty final manifest — cannot occur here).
    assert(SnapshotStore.versions(spark, dir) == Seq(1))
    assert(SnapshotStore.read(spark, dir).count() == 5)
    val e = intercept[IllegalStateException](SnapshotStore.publish(d, dir))
    assert(e.getMessage.contains("vacuum"), e.getMessage)
    SnapshotStore.vacuum(spark, dir, keepVersions = 1)
    assert(!Files.exists(java.nio.file.Paths.get(dir, "manifest-v2.lock")),
      "vacuum must sweep the uncommitted version's lock")
    assert(!Files.exists(java.nio.file.Paths.get(dir, "manifest-v2.txt.tmp")),
      "vacuum must sweep the uncommitted version's tmp")
    assert(Files.exists(java.nio.file.Paths.get(dir, "manifest-v1.lock")),
      "vacuum must KEEP the retained version's lock (the durable claim)")
    assert(SnapshotStore.publish(d, dir) == 2)
    assert(SnapshotStore.read(spark, dir).count() == 5)
  }

  test("compact: many small files rewrite to one new version; rows identical; " +
    "old version reads until vacuumed; already-compact tables are left alone") {
    val dir = freshDir()
    val d = (1 to 400).map(i => (i.toLong, s"row$i" * 10)).toDF("id", "s")
    // 32 tiny files — the accreted-small-publishes pathology.
    SnapshotStore.publish(d.repartition(32), dir)
    def nFiles(v: Int) = SnapshotStore.read(spark, dir, Some(v))
      .inputFiles.length
    assert(nFiles(1) == 32)
    val v2 = SnapshotStore.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(v2.contains(2), s"got $v2")
    assert(nFiles(2) == 1, "a GiB target must collapse this table to one file")
    // Semantic identity + undisturbed time travel.
    assert(SnapshotStore.read(spark, dir).orderBy($"id")
      .as[(Long, String)].collect().toSeq ==
      SnapshotStore.read(spark, dir, Some(1)).orderBy($"id")
        .as[(Long, String)].collect().toSeq)
    // Idempotence: the compacted latest is at/below target — no-op.
    assert(SnapshotStore.compact(spark, dir, targetFileBytes = 1L << 30).isEmpty)
    // Vacuum then reclaims the 32 small files; the compact version reads.
    assert(SnapshotStore.vacuum(spark, dir, keepVersions = 1) >= 32)
    assert(SnapshotStore.read(spark, dir).count() == 400)
    intercept[IllegalArgumentException](SnapshotStore.read(spark, dir, Some(1)))
  }

  test("compact(sortCols): output files cover disjoint key ranges — the " +
    "clustered rewrite parquet min/max pruning needs") {
    val dir = freshDir()
    // Shuffled ids so the original layout has NO range structure.
    val d = scala.util.Random.shuffle((1 to 600).toList)
      .map(i => (i.toLong, s"v$i")).toDF("id", "s")
    SnapshotStore.publish(d.repartition(16), dir)
    val v2 = SnapshotStore.compact(spark, dir,
      targetFileBytes = 4096L, sortCols = Seq("id"))
    assert(v2.nonEmpty)
    val parts = SnapshotStore.read(spark, dir, Some(v2.get)).inputFiles
    assert(parts.length >= 2, s"need >= 2 files to prove disjointness, got ${parts.length}")
    val ranges = parts.toSeq.map { p =>
      val r = spark.read.parquet(p).agg(min($"id"), max($"id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) =>
        assert(hiA < loB, s"file ranges overlap: $ranges")
      case _ =>
    }
    assert(SnapshotStore.read(spark, dir, Some(v2.get)).count() == 600)
  }

  test("vacuum drops a superseded version's lock with its manifest") {
    val dir = freshDir()
    val d = (1 to 3).map(i => (i.toLong, s"r$i")).toDF("id", "s")
    SnapshotStore.publish(d, dir)
    SnapshotStore.publish(d.filter($"id" <= 1), dir)
    SnapshotStore.vacuum(spark, dir, keepVersions = 1)
    assert(!Files.exists(java.nio.file.Paths.get(dir, "manifest-v1.lock")))
    assert(Files.exists(java.nio.file.Paths.get(dir, "manifest-v2.lock")))
    assert(SnapshotStore.read(spark, dir).count() == 1)
  }
}
