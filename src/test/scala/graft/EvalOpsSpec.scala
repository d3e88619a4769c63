package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CorpusOps, EvalOps}

class EvalOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def labeledDocs = spark.read.parquet(s"$sf0001/documents.parquet")
    .select($"source", $"n_chars",
      when($"lang" === "en", 1L).otherwise(0L).as("lab"))

  test("rocAuc ≡ brute-force pair counting on the fixture (per source)") {
    val rows = labeledDocs.as[(String, Long, Long)].collect()
    val expect = rows.groupBy(_._1).map { case (src, grp) =>
      val pos = grp.filter(_._3 == 1L).map(_._2)
      val neg = grp.filter(_._3 == 0L).map(_._2)
      // Probability a random (pos, neg) pair is correctly ordered, ties ½.
      val auc =
        if (pos.isEmpty || neg.isEmpty) None
        else {
          val wins = (for (p <- pos; n <- neg)
            yield if (p > n) 2L else if (p == n) 1L else 0L).sum
          Some(wins.toDouble / (2L * pos.length * neg.length).toDouble)
        }
      src -> (pos.length.toLong, neg.length.toLong, auc)
    }
    val got = EvalOps.rocAuc(labeledDocs, "source", "n_chars", "lab")
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
    assert(got.length == expect.size)
    got.foreach { case (src, np, nn, num, den, auc) =>
      val (ep, en, eauc) = expect(src)
      assert((np, nn) == (ep, en), src)
      assert(den == 2L * np * nn, src)
      // The rank-sum numerator is exactly 2·(wins + ties/2), so the two
      // divisions share identical operands: bit-exact equality, not approx.
      assert(auc === eauc, src)
      eauc.foreach(e => assert(num.toDouble / den.toDouble == e, src))
    }
  }

  test("rocAuc: perfect separation → 1.0, inverted → 0.0, degenerate → null") {
    val perfect = Seq(("g", 10L, 1L), ("g", 9L, 1L), ("g", 2L, 0L), ("g", 1L, 0L))
      .toDF("g", "score", "lab")
    assert(EvalOps.rocAuc(perfect, "g", "score", "lab")
      .select($"auc").as[Double].head() == 1.0)
    val inverted = perfect.withColumn("lab", lit(1L) - $"lab")
    assert(EvalOps.rocAuc(inverted, "g", "score", "lab")
      .select($"auc").as[Double].head() == 0.0)
    val onlyPos = Seq(("g", 1L, 1L), ("g", 2L, 1L)).toDF("g", "score", "lab")
    assert(EvalOps.rocAuc(onlyPos, "g", "score", "lab")
      .select($"auc").as[Option[Double]].head().isEmpty)
  }

  test("rocAuc: all-tied scores → 0.5 exactly (pure midrank path)") {
    val tied = Seq(("g", 5L, 1L), ("g", 5L, 0L), ("g", 5L, 1L), ("g", 5L, 0L))
      .toDF("g", "score", "lab")
    assert(EvalOps.rocAuc(tied, "g", "score", "lab")
      .select($"auc").as[Double].head() == 0.5)
  }

  test("rocAuc is partitioning-invariant (bit-exact doubles)") {
    val a = EvalOps.rocAuc(labeledDocs.repartition(13), "source", "n_chars", "lab")
      .orderBy($"source").collect().toSeq
    val b = EvalOps.rocAuc(labeledDocs.coalesce(1), "source", "n_chars", "lab")
      .orderBy($"source").collect().toSeq
    assert(a == b)
  }

  test("rocAuc rejects labels outside {0, 1}") {
    val bad = Seq(("g", 1L, 2L)).toDF("g", "score", "lab")
    val e = intercept[Exception] {
      EvalOps.rocAuc(bad, "g", "score", "lab").collect()
    }
    assert(e.getMessage.contains("must be 0/1") ||
      Option(e.getCause).exists(_.getMessage.contains("must be 0/1")))
  }

  test("operatingPoint ≡ brute-force threshold scan on the fixture") {
    val rows = labeledDocs.as[(String, Long, Long)].collect()
    val expect = rows.groupBy(_._1).flatMap { case (src, grp) =>
      val pos = grp.count(_._3 == 1L).toLong
      grp.map(_._2).distinct.sorted
        .map { th =>
          val pred = grp.filter(_._2 >= th)
          val tp = pred.count(_._3 == 1L).toLong
          (th, tp, pred.length.toLong)
        }
        .find { case (_, tp, pp) => tp * 2 >= pp * 1 && tp > 0 }
        .map { case (th, tp, pp) =>
          src -> ((th, tp, pp - tp, pos - tp,
            tp.toDouble / pp.toDouble, tp.toDouble / pos.toDouble))
        }
    }
    val got = EvalOps.operatingPoint(labeledDocs, "source", "n_chars", "lab", 1, 2)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (src, th, tp, fp, fn, prec, rec) =>
      assert(expect(src) == ((th, tp, fp, fn, prec, rec)), src)
    }
  }

  test("operatingPoint hand case: target 3/4 forces the strict threshold") {
    // scores 4,3,2,1 with labels 1,0,1,0: precision@{4,3,2,1} =
    // 1/1, 1/2, 2/3, 2/4 — at target 3/4 only threshold 4 qualifies
    // (recall 1/2); at target 1/2 thresholds 4,2,1 qualify → min is 1
    // (recall 1). Both the strict and the max-recall cut are pinned.
    val d = Seq(("g", 4L, 1L), ("g", 3L, 0L), ("g", 2L, 1L), ("g", 1L, 0L))
      .toDF("g", "score", "lab")
    val strict = EvalOps.operatingPoint(d, "g", "score", "lab", 3, 4)
      .as[(String, Long, Long, Long, Long, Double, Double)].head()
    assert(strict == (("g", 4L, 1L, 0L, 1L, 1.0, 0.5)))
    val loose = EvalOps.operatingPoint(d, "g", "score", "lab", 1, 2)
      .as[(String, Long, Long, Long, Long, Double, Double)].head()
    assert(loose == (("g", 1L, 2L, 2L, 0L, 0.5, 1.0)))
  }

  test("operatingPoint: a group that never reaches the target emits no row") {
    val d = Seq(("g", 2L, 0L), ("g", 1L, 1L)).toDF("g", "score", "lab")
    // precision@2 = 0/1 (tp=0 excluded), precision@1 = 1/2 < 9/10
    assert(EvalOps.operatingPoint(d, "g", "score", "lab", 9, 10).isEmpty)
  }

  test("calibrationBins ≡ driver-side equi-depth reference on the fixture") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"n_chars",
        when($"lang" === "en", 1L).otherwise(0L).as("lab"))
    val rows = d.as[(Long, Long, Long)].collect().sortBy(r => (r._2, r._1))
    val n = rows.length
    val k = 8
    val expect = rows.zipWithIndex
      .groupBy { case (_, i) => i.toLong * k / n }
      .toSeq.sortBy(_._1)
      .map { case (bin, g) =>
        val cnt = g.length.toLong
        val npos = g.map(_._1._3).sum
        (bin.toInt, cnt, npos,
          g.map(_._1._2).sum.toDouble / cnt.toDouble,
          npos.toDouble / cnt.toDouble)
      }
    val got = EvalOps.calibrationBins(d, "n_chars", "lab", Seq($"doc_id"), k)
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(got == expect)
    // Equi-depth by construction: bins differ in size by at most one.
    val sizes = got.map(_._2)
    assert(sizes.max - sizes.min <= 1 && sizes.sum == n.toLong)
  }

  test("calibrationBins: fractional scores keep an exact decimal bin mean") {
    // r15 ADVICE: the old LONG cast truncated each 0.5 to 0 row-by-row.
    val d = Seq((1L, 0.5, 1L), (2L, 0.5, 0L), (3L, 1.5, 1L), (4L, 2.5, 1L))
      .toDF("id", "score", "lab")
    val got = EvalOps.calibrationBins(d, "score", "lab", Seq($"id"), k = 2)
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((0, 2L, 1L, 0.5, 0.5), (1, 2L, 2L, 2.0, 1.0)), s"got $got")
  }

  test("dsirWeights ≡ driver-side reference with the same hash and bit-lengths") {
    val prime = 1000000007L
    def polyHash(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31L + c.toLong) % prime)
    def bits(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val B = 64
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text", $"lang")
    val rows = d.as[(Long, String, String)].collect()
    val toks = rows.filter(r => r._2 != null && r._2.nonEmpty)
      .flatMap { case (id, text, lang) =>
        text.split(" ", -1).map(t => (id, lang == "en", polyHash(t) % B))
      }
    val cr = toks.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val ct = toks.filter(_._2).groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val rTot = toks.length.toLong
    val tTot = toks.count(_._2).toLong
    val norm = bits(rTot + B) - bits(tTot + B)
    val expect = toks.groupBy(_._1).view.mapValues { g =>
      val s = g.map(t => bits(ct.getOrElse(t._3, 0L) + 1) - bits(cr(t._3) + 1)).sum
      (g.length.toLong, s + g.length * norm)
    }.toMap
    val got = CorpusOps.dsirWeights(d, "doc_id", "text",
      isTarget = $"lang" === "en", buckets = B)
      .as[(Long, Long, Long)].collect()
    assert(got.length == expect.size)
    got.foreach { case (id, nt, w) => assert((nt, w) == expect(id), s"doc $id") }
  }

  test("dsirWeights ranks target-like docs above non-target-like docs") {
    // Target docs are made of 'alpha beta', raw-only junk of 'zork quux':
    // a fresh raw doc of target tokens must outweigh one of junk tokens.
    val d = (Seq.tabulate(20)(i => (i.toLong, "alpha beta alpha beta", true)) ++
      Seq.tabulate(20)(i => (100L + i, "zork quux zork quux", false)) ++
      Seq((900L, "alpha beta alpha beta", false),
          (901L, "zork quux zork quux", false)))
      .toDF("id", "text", "tgt")
    val w = CorpusOps.dsirWeights(d, "id", "text", isTarget = $"tgt", buckets = 64)
      .filter($"id" >= 900L)
      .select($"id", $"weight").as[(Long, Long)].collect().toMap
    assert(w(900L) > w(901L))
  }

  test("cohensKappa ≡ brute-force confusion-matrix kappa on random labels") {
    val rnd = new scala.util.Random(4242)
    val labs = Array("a", "b", "c", "d")
    val rows = Seq.tabulate(600) { i =>
      (s"g${i % 5}", labs(rnd.nextInt(4)), labs(rnd.nextInt(4)))
    }
    val got = EvalOps.cohensKappa(rows.toDF("grp", "ra", "rb"), "grp", "ra", "rb")
      .as[(String, Long, Long, Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val n = grp.length.toLong
      val agree = grp.count(r => r._2 == r._3).toLong
      val peNum = labs.map(l =>
        grp.count(_._2 == l).toLong * grp.count(_._3 == l).toLong).sum
      val (_, gn, gAgree, gPe, gNum, gDen, gK) = got(g)
      assert((gn, gAgree, gPe) == ((n, agree, peNum)), s"group $g")
      assert((gNum, gDen) == ((n * agree - peNum, n * n - peNum)), s"group $g")
      assert(gK.contains((n * agree - peNum).toDouble / (n * n - peNum).toDouble))
    }
  }

  test("cohensKappa degenerate groups: constant raters NULL, disjoint labels pe=0") {
    val d = Seq(
      // both raters constant and equal: p_e = 1 -> kappa NULL
      ("const", "x", "x"), ("const", "x", "x"),
      // raters share no label: pe_num = 0, kappa = p_o = 0
      ("disj", "a", "b"), ("disj", "a", "b")).toDF("grp", "ra", "rb")
    val got = EvalOps.cohensKappa(d, "grp", "ra", "rb")
      .as[(String, Long, Long, Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("const")._7.isEmpty && got("const")._6 == 0L)
    assert(got("disj")._4 == 0L && got("disj")._7.contains(0.0))
  }

  test("cohensKappaFromCounts over pre-aggregated cells ≡ cohensKappa on " +
    "raw rows (incl. degenerate groups)") {
    val rnd = new scala.util.Random(9191)
    val labs = Array("a", "b", "c")
    val rows = Seq.tabulate(300) { i =>
      (s"g${i % 4}", labs(rnd.nextInt(3)), labs(rnd.nextInt(3)))
    } ++ Seq(("const", "x", "x"), ("const", "x", "x"),
      ("disj", "a", "b"), ("disj", "a", "b"))
    val df = rows.toDF("grp", "ra", "rb")
    val cells = df.groupBy($"grp", $"ra", $"rb").agg(count(lit(1)).as("c"))
    val viaCounts = EvalOps
      .cohensKappaFromCounts(cells, "grp", "ra", "rb", "c")
      .orderBy($"grp")
      .as[(String, Long, Long, Long, Long, Long, Option[Double])]
      .collect().toSeq
    val viaRows = EvalOps.cohensKappa(df, "grp", "ra", "rb")
      .orderBy($"grp")
      .as[(String, Long, Long, Long, Long, Long, Option[Double])]
      .collect().toSeq
    assert(viaCounts == viaRows)
  }

  test("classPrfFromCounts over pre-aggregated cells ≡ classPrf on raw " +
    "rows (gold-only and pred-only classes included)") {
    val rnd = new scala.util.Random(3434)
    val labs = Array("w", "x", "y", "z")
    // pred never emits "z", gold never emits "w" at index 3: both
    // one-sided classes flow through the full-outer join on both paths.
    val rows = Seq.tabulate(350)(_ =>
      (labs(1 + rnd.nextInt(3)), labs(rnd.nextInt(3))))
    val df = rows.toDF("gold", "pred")
    val cells = df.groupBy($"gold", $"pred").agg(count(lit(1)).as("c"))
    val viaCounts = EvalOps.classPrfFromCounts(cells, "gold", "pred", "c")
      .orderBy($"cls")
      .as[(String, Option[Long], Option[Long], Option[Long],
        Option[Double], Option[Double], Option[Double])].collect().toSeq
    val viaRows = EvalOps.classPrf(df, "gold", "pred")
      .orderBy($"cls")
      .as[(String, Option[Long], Option[Long], Option[Long],
        Option[Double], Option[Double], Option[Double])].collect().toSeq
    assert(viaCounts == viaRows && viaCounts.length == 5) // 4 classes + macro
  }

  test("classPrfFromCounts drops zero-count cells: a pre-seeded label " +
    "domain adds no phantom classes and leaves the macro row unmoved") {
    val rows = Seq(("x", "x"), ("x", "y"), ("y", "y")).toDF("gold", "pred")
    val cells = rows.groupBy($"gold", $"pred").agg(count(lit(1)).as("c"))
    // A stream pre-seeding its full label domain emits (q, q, 0) cells for
    // unobserved labels — they must not enter the full-outer join (r18
    // ADVICE: each phantom class shifts the macro-F1 denominator).
    val seeded = cells.unionByName(
      Seq(("q", "q", 0L), ("z", "x", 0L)).toDF("gold", "pred", "c"))
    val clean = EvalOps.classPrfFromCounts(cells, "gold", "pred", "c")
      .orderBy($"cls").collect().toSeq
    val viaSeeded = EvalOps.classPrfFromCounts(seeded, "gold", "pred", "c")
      .orderBy($"cls").collect().toSeq
    assert(viaSeeded == clean && clean.length == 3) // x, y, macro — no q/z
  }

  test("classPrf ≡ brute-force per-class PRF + sorted-fold macro") {
    val rnd = new scala.util.Random(777)
    val labs = Array("w", "x", "y", "z")
    val rows = Seq.tabulate(400)(_ => (labs(rnd.nextInt(4)), labs(rnd.nextInt(3))))
    // pred never emits "z": a gold-only class must appear with n_pred=0.
    val got = EvalOps.classPrf(rows.toDF("gold", "pred"), "gold", "pred")
      .as[(String, Option[Long], Option[Long], Option[Long],
        Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val classes = (rows.map(_._1) ++ rows.map(_._2)).distinct.sorted
    val f1s = classes.map { c =>
      val nGold = rows.count(_._1 == c).toLong
      val nPred = rows.count(_._2 == c).toLong
      val tp = rows.count(r => r._1 == c && r._2 == c).toLong
      val (_, gg, gp, gtp, gPrec, gRec, gF1) = got(c)
      assert((gg, gp, gtp) == ((Some(nGold), Some(nPred), Some(tp))), c)
      assert(gPrec == (if (nPred == 0) None else Some(tp.toDouble / nPred)), c)
      assert(gRec == (if (nGold == 0) None else Some(tp.toDouble / nGold)), c)
      val f1 = if (nGold + nPred == 0) None
        else Some(2.0 * tp / (nGold + nPred).toDouble)
      assert(gF1 == f1, c)
      f1.getOrElse(0.0)
    }
    // macro: left-to-right fold in class order, then one division
    val macroF1 = f1s.foldLeft(0.0)(_ + _) / classes.length.toDouble
    assert(got("__macro__")._7.contains(macroF1))
    assert(got.size == classes.length + 1)
  }

  test("retrievalMetrics ≡ brute-force nDCG/MRR with the shared literal weights") {
    val rnd = new scala.util.Random(88)
    val k = 10
    val w = EvalOps.ndcgWeights(k)
    val prefix = w.scanLeft(0.0)(_ + _).tail
    // labels over 60 items, queries = ids 0..9; rankings synthetic.
    val labels = (0 until 60).map(i => (i.toLong, rnd.nextInt(5)))
    val labMap = labels.toMap.map { case (i, l) => i -> l }
    val ranked = (0 until 10).flatMap { q =>
      val neigh = rnd.shuffle((0 until 60).filterNot(_ == q).toList).take(k)
      neigh.zipWithIndex.map { case (nid, i) => (q.toLong, i + 1, nid.toLong) }
    }
    val got = EvalOps.retrievalMetrics(
      ranked.toDF("query_id", "rank", "neighbor_id"),
      labels.toDF("id", "lab"), "id", "lab", k)
      .as[(Long, Option[Long], Double, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val perQ = (0 until 10).map { q =>
      val qlab = labMap(q.toLong)
      val nRel = labels.count(_._2 == qlab).toLong - 1
      val rels = ranked.filter(_._1 == q.toLong).sortBy(_._2)
        .map(r => labMap(r._3) == qlab)
      val dcg = rels.zipWithIndex.foldLeft(0.0) { case (acc, (rel, i)) =>
        acc + (if (rel) w(i) else 0.0)
      }
      val mrr = rels.indexOf(true) match {
        case -1 => 0.0
        case i => 1.0 / (i + 1).toDouble
      }
      val ndcg = if (nRel == 0) None
        else Some(dcg / prefix(math.min(nRel, k.toLong).toInt - 1))
      val (_, gn, gmrr, gdcg, gndcg) = got(q.toLong)
      assert(gn.contains(nRel) && gmrr == mrr && gdcg.contains(dcg), s"q$q")
      assert(gndcg == ndcg, s"q$q")
      (mrr, ndcg.getOrElse(0.0))
    }
    val macroMrr = perQ.map(_._1).foldLeft(0.0)(_ + _) / 10.0
    val macroNdcg = perQ.map(_._2).foldLeft(0.0)(_ + _) / 10.0
    assert(got(-1L)._3 == macroMrr && got(-1L)._5.contains(macroNdcg))
  }

  test("retrievalMetrics: a query whose label is unique reports NULL ndcg, mrr 0") {
    val labels = Seq((0L, "only"), (1L, "a"), (2L, "a"), (3L, "a"))
    val ranked = Seq((0L, 1, 1L), (0L, 2, 2L), (0L, 3, 3L))
    val got = EvalOps.retrievalMetrics(
      ranked.toDF("query_id", "rank", "neighbor_id"),
      labels.toDF("id", "lab"), "id", "lab", 3)
      .as[(Long, Option[Long], Double, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(0L)._2.contains(0L) && got(0L)._3 == 0.0 && got(0L)._5.isEmpty)
  }

  test("pairSetPrf: controlled overlap, duplicate collapse, empty edges") {
    def pairs(ps: (Long, Long)*) = ps.toDF("doc_i", "doc_j")
    val pred = pairs((1L, 2L), (1L, 2L), (3L, 4L), (5L, 6L)) // dup collapses
    val truth = pairs((1L, 2L), (3L, 4L), (7L, 8L))
    val got = EvalOps.pairSetPrf(pred, truth)
      .as[(Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .head()
    assert(got == ((2L, 1L, 1L, Some(2.0 / 3.0), Some(2.0 / 3.0),
      Some(4.0 / 6.0))))
    val emptyPred = EvalOps.pairSetPrf(pairs(), truth)
      .as[(Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .head()
    assert(emptyPred == ((0L, 0L, 3L, None, Some(0.0), Some(0.0))))
    val bothEmpty = EvalOps.pairSetPrf(pairs(), pairs())
      .as[(Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .head()
    assert(bothEmpty == ((0L, 0L, 0L, None, None, None)))
  }

  test("retrievalMetrics fails loudly when a query has no label") {
    val labels = Seq((1L, "a"), (2L, "a"))
    val ranked = Seq((99L, 1, 1L)) // query 99 unlabeled
    val e = intercept[Exception] {
      EvalOps.retrievalMetrics(ranked.toDF("query_id", "rank", "neighbor_id"),
        labels.toDF("id", "lab"), "id", "lab", 3).collect()
    }
    assert(e.getMessage.contains("has no label") ||
      Option(e.getCause).exists(_.getMessage.contains("has no label")))
  }

  test("cohensKappa rejects null rater labels") {
    val d = Seq(("g", Some("a"), Some("a")), ("g", None, Some("b")))
      .toDF("grp", "ra", "rb")
    val e = intercept[Exception] {
      EvalOps.cohensKappa(d, "grp", "ra", "rb").collect()
    }
    assert(e.getMessage.contains("cohensKappa") ||
      Option(e.getCause).exists(_.getMessage.contains("cohensKappa")))
  }
}
