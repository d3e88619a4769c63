package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards for the 100 TB posture: these assert the
  * SHAPE Catalyst produces — filters reaching the parquet scan, projections
  * pruning the read schema, small dimensions broadcast, no cartesian
  * products — so a future edit that silently loses a pushdown or turns a
  * broadcast join into a sort-merge-over-everything fails a unit test, not a
  * production run.
  */
class PlanShapeSpec extends AnyFunSuite with SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.queryExecution.executedPlan.toString
  }

  test("q1: shipdate filter is pushed to the parquet scan, schema pruned") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushed filter in:\n$p")
    // only the 6 referenced columns are read, not lineitem's full width
    assert(p.contains("ReadSchema") && !p.contains("l_comment"), "schema not pruned")
  }

  test("q5: all five dimension tables broadcast; no cartesian product") {
    val p = plan("q5_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, s"dimensions not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q3: dimension broadcast + single aggregate over the fact join") {
    val p = plan("q3_top_unshipped")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_cosine_topk: query side broadcast, data vectors never shuffled") {
    val p = plan("q_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query set must broadcast:\n$p")
  }

  test("topK: salted partial stage before the per-query merge (no full-candidate sort)") {
    val p = plan("q_cosine_topk")
    // two-stage top-k = two Window nodes; the first partitions by (query, salt)
    assert("Window ".r.findAllIn(p).size >= 2, s"missing partial top-k stage:\n$p")
    assert(p.contains("salt"), s"partial stage must rank within salt buckets:\n$p")
  }

  test("ivf assignment: zero-shuffle broadcast fold — no Exchange/Sort/Window") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val idx = graft.operators.VectorOps.ivfAssign(
      e, e.filter(col("vec_id") < 10), "vec_id", "embedding")
    val p = idx.assignments.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"assignment must not rank via a window:\n$p")
    assert(!p.contains("Sort"), s"assignment must not sort:\n$p")
    // the data side must reach the fold without shuffling; the only exchange
    // allowed is the single-row centroid pack's (broadcast build side)
    assert(!p.contains("Exchange hashpartitioning"),
      s"assignment must not shuffle the data side:\n$p")
    // and the fold must be the compiled expression, inside whole-stage
    // codegen — not the interpreted aggregate/zip_with HOF it replaced
    assert(p.contains("graft_nearest_centroid"),
      s"assignment must use the codegen'd NearestCentroid expression:\n$p")
    idx.assignments.collect()
    val fin = idx.assignments.queryExecution.executedPlan.toString
    assert(fin.contains("*(1)"), s"assignment fell out of codegen:\n$fin")
  }

  test("srp signature stage: compiled expression inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val sigs = e.select(col("vec_id"),
      graft.operators.VectorOps.srpSignature(col("embedding"), 32, 64).as("sig"))
    val p = sigs.queryExecution.executedPlan.toString
    assert(p.contains("graft_srp_signature"),
      s"signature must be the codegen'd SrpSignature expression:\n$p")
    sigs.collect()
    val fin = sigs.queryExecution.executedPlan.toString
    assert(fin.contains("*(1)"), s"signature stage fell out of codegen:\n$fin")
  }

  test("q_ngram_jaccard: packed prefix path — no window, no full-index shuffle") {
    val p = plan("q_ngram_jaccard")
    assert(p.contains("graft_prefix_tokens"),
      s"prefix selection must be the row-local generator:\n$p")
    assert(p.contains("graft_packed_shingles"),
      s"shingling must be the packed-long expression:\n$p")
    assert(!p.contains("Window"),
      s"the per-doc rank window (full inverted-index shuffle) must be gone:\n$p")
    // Remaining hash exchanges: pair-dedup + the SHUFFLE_HASH joins on slim
    // keys (doc ids / prefix tokens) — never the full (doc, token) index.
    // The repartition barrier and final single-partition sort are not
    // per-token shuffles. A regression to the window form would show as a
    // Window node or an exchange over sj_id on the full index.
    assert(!p.contains("Exchange hashpartitioning(sj_id"),
      s"full-index per-doc exchange must not exist:\n$p")
  }

  test("q_containment: equi-join candidates, compiled shingles, no cartesian") {
    val p = plan("q_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must come from the prefix/token equi-join, never all-pairs:\n$p")
    assert(p.contains("graft_word_shingles"),
      s"shingling must be the compiled WordShingles expression:\n$p")
    // The rare-first df/rank machinery rides the (token) index exchange. At
    // this tiny SF the planner BROADCASTS the candidate join's build side,
    // which blocks ReuseExchange across the broadcast boundary and shows the
    // index exchange twice (probe branch + build branch) — at scale the
    // build side is far past any broadcast threshold and the self-join's
    // two reads reuse one exchange. Pin the bound, not the tiny-SF artifact:
    // three or more would mean a genuinely new full-index shuffle appeared.
    val idxExchanges = "Exchange hashpartitioning\\(sj_tok".r.findAllIn(p).size
    assert(idxExchanges <= 2,
      s"unexpected extra full-index exchange:\n$p")
  }

  test("q_decontaminate: window-hash equi-join — no cartesian, no nested loop") {
    val p = plan("q_decontaminate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"overlap detection must stay an equi-join on window hashes:\n$p")
    assert(p.contains("graft_window_hashes"),
      s"window hashing must be the fused compiled expression:\n$p")
  }

  test("q_rrf_fusion: both rankings broadcast the query side") {
    val p = plan("q_rrf_fusion")
    assert("Broadcast(NestedLoop|Hash)Join".r.findAllIn(p).size >= 2,
      s"both ranking stages must broadcast the query set:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_hybrid_retrieval: every join broadcast — no sort-merge, no cartesian") {
    val p = plan("q_hybrid_retrieval")
    // BM25 leg: df + doc-length dims broadcast onto the pruned tf stream;
    // dense leg: query vector broadcast onto the corpus scan. A
    // SortMergeJoin anywhere means a leg started shuffling its corpus.
    assert("Broadcast(NestedLoop|Hash)Join".r.findAllIn(p).size >= 2,
      s"legs must broadcast their small sides:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no leg may shuffle-join the corpus:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_cdc_apply: merge-key plan — window dedup + anti-join, no cartesian") {
    val p = plan("q_cdc_apply")
    assert(p.contains("LeftAnti"), s"untouched rows must come from an anti-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_merge_upsert: no more than two exchanges on the merge key path") {
    // merge = window-dedup + anti-join + union on the same key; a regression
    // that re-shuffles per stage would show up as extra exchanges.
    val p = plan("q_merge_upsert")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 3, s"unexpected shuffle count $exchanges in:\n$p")
  }

  test("merge family: exchange COUNTS pinned — a Spark upgrade can't silently double them") {
    // Shape guards elsewhere in this spec catch cartesians and lost
    // broadcasts; these pin the NUMBER of hash exchanges so a planner
    // change that re-shuffles an already-partitioned stream (e.g. a second
    // exchange between SCD2's two window passes over the same keys) fails
    // here instead of surfacing as a silent 2× shuffle bill at scale.
    def hashExchanges(q: String): Int =
      "Exchange hashpartitioning".r.findAllIn(plan(q)).size
    // scdType2: BOTH window passes (lead/lag) share the single key-hash
    // exchange — the documented one-exchange contract (MergeOps.scdType2).
    assert(hashExchanges("q_scd2") === 1,
      "scdType2 must serve both window passes from ONE key exchange")
    // cdc apply: dedup window + anti-join on the same key — 2 exchanges
    // (the key exchange feeding the window, and the base side of the
    // anti-join); the union must not add a third.
    assert(hashExchanges("q_cdc_apply") <= 2,
      "cdcApply must not re-shuffle the merge-key path")
    // incremental agg maintenance: changes agg + change-key semi-join +
    // base-delta agg + final merge — 4 keyed exchanges, none of them over
    // the full base table's raw rows twice.
    assert(hashExchanges("q_incr_agg") <= 4,
      "incrementalAgg must touch base only via the semi-joined delta path")
  }

  test("q_sql_correlated: subqueries decorrelate into joins, no per-row subquery") {
    val p = plan("q_sql_correlated")
    assert(p.contains("LeftSemi"), s"EXISTS must become a semi-join:\n$p")
    assert(p.contains("LeftOuter"), s"scalar COUNT subquery must become an outer join + aggregate:\n$p")
    assert(!p.contains("ScalarSubquery"), s"subquery must not execute per-row:\n$p")
  }

  test("q_sql_lateral: lateral LIMIT decorrelates to a rank window, predicate pushed through") {
    // The correlated LATERAL (ORDER BY + LIMIT 2) must become the
    // engine-side top-N-per-group shape — a rank window over the inner
    // side + ONE equi-join — never a per-outer-row subquery or a
    // cartesian; and the OUTER key restriction must transit the lateral
    // onto the lineitem scan (a plan that scans all of lineitem to rank
    // rows the join will drop is wrong at any scale).
    val p = plan("q_sql_lateral")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"lateral must decorrelate into an equi-join:\n$p")
    assert(p.contains("Window"), s"the LIMIT must become a rank window:\n$p")
    assert("Join".r.findAllIn(p).size === 1, s"exactly one join:\n$p")
    // Anchored to the scan's PushedFilters section: a post-scan Filter node
    // carrying the same predicate must NOT satisfy this (r12 ADVICE — the
    // old disjunction degenerated to a substring match anywhere in the plan).
    assert("PushedFilters: \\[[^\\]]*LessThanOrEqual\\(l_orderkey,1000\\)".r.findFirstIn(p).isDefined,
      s"outer restriction must reach the inner scan's PushedFilters:\n$p")
  }

  test("q_partition_prune: event_type predicate prunes at planning time") {
    val p = plan("q_partition_prune")
    // The predicate must land in PartitionFilters (directory pruning), not
    // in PushedFilters/post-scan Filter (row-level work on opened files).
    assert(p.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*event_type[^\\]]*purchase".r.findFirstIn(p).isDefined,
      s"event_type must prune partitions:\n$p")
    // And the scan must NOT read the partition column's sibling directories'
    // data columns for nothing: only the 2 referenced data columns remain.
    assert(p.contains("ReadSchema") && !p.contains("event_id"),
      s"schema not pruned to user_id/value:\n$p")
  }

  test("q_weighted_sample: top-k via TakeOrderedAndProject, never a full sort") {
    val p = plan("q_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"A-ES selection must be a distributed top-k:\n$p")
  }

  test("q_heavy_hitters: candidate join broadcasts; vocabulary never sort-merges") {
    val p = plan("q_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"), s"candidate semi-join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"vocabulary must not shuffle-join:\n$p")
  }

  test("q_seq_pack: inputs-only gate prunes the window — no hash exchange at all") {
    val p = plan("q_seq_pack")
    val dataExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(dataExchanges === 0,
      s"token counting needs no shuffle once the offset window is pruned:\n$p")
  }

  test("q_seq_pack_offsets: exactly one data exchange — the stream-key window shuffle") {
    val p = plan("q_seq_pack_offsets")
    val dataExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(dataExchanges === 1, s"packing must shuffle once on the stream key:\n$p")
  }

  test("q_chunk_docs: no shuffle — chunking is a pure per-row generate") {
    val p = plan("q_chunk_docs")
    assert(!p.contains("Exchange hashpartitioning"), s"chunking must not shuffle:\n$p")
    assert(p.contains("Generate"), s"expected an explode-based generate:\n$p")
  }

  test("q_vocab_build: top-V via TakeOrdered merge, never a full vocabulary sort") {
    val p = plan("q_vocab_build")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-V must be per-partition top-k + driver merge:\n$p")
    // the only Sort allowed is inside the V-row ranking window, not a
    // global Exchange rangepartitioning over the whole vocabulary
    assert(!p.contains("Exchange rangepartitioning"),
      s"full vocabulary must not be globally sorted:\n$p")
  }

  test("q_temperature_mix: stratum counts broadcast — the corpus side never shuffles") {
    val p = plan("q_temperature_mix")
    assert(p.contains("BroadcastHashJoin"), s"counts must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle for the join:\n$p")
  }

  test("bpeSegment: one exchange (the word aggregate), no join, constant depth in k") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val rules = (1 to 12).map(i => s"x$i" -> s"y$i") // any k; rules are data
    val df = graft.operators.CorpusOps.bpeSegment(docs, "doc_id", "text", rules)
    val p = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 1, s"encoder must shuffle once, for the word count:\n$p")
    assert(!p.contains("Join"), s"encoder must not join against the corpus:\n$p")
    // the merge rules ride along as ONE array literal inside a single
    // fold — k=12 must not nest k fold layers into the plan text
    assert("aggregate\\(".r.findAllIn(p.toLowerCase).size <= 4,
      s"rules must be data inside one fold, not k chained folds:\n$p")
  }

  test("q_sample_quantiles: ONE keyed exchange — the sample rides map-side merges") {
    // The whole point of the bottom-k-by-hash sample: the value column is
    // never sorted or shuffled; partial O(k) buffers combine map-side and
    // one hash exchange on the group key carries k pairs per (group,
    // partition). A Sort or a second hash exchange means the sample
    // degenerated into a data shuffle.
    val p = plan("q_sample_quantiles")
    val dataExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(dataExchanges === 1, s"sample aggregate must shuffle once, on the group key:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"values must never be globally sorted:\n$p")
  }

  test("q_edit_join: candidates from equi-joins only — never an all-pairs scan") {
    val p = plan("q_edit_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"edit join must never go all-pairs:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(p_partkey), LessThanOrEqual(p_partkey,600)"),
      s"key restriction must reach the scan:\n$p")
  }

  test("q_semdedup and q_cosine_topk: pair cosine is the compiled dot, not the HOF fold") {
    val sd = plan("q_semdedup")
    assert(sd.contains("graft_dot"), s"semdedup cosine must be compiled:\n$sd")
    // the interpreted fold would print as aggregate(zip_with(...)) in the
    // pair-join condition; only the assignment's vnn input may keep HOF form
    assert(!sd.contains("CartesianProduct"), s"pairs must come from the cluster equi-join:\n$sd")
    assert(plan("q_cosine_topk").contains("graft_dot"))
  }

  test("q_triangles: wedge closing is an equi-join; no cartesian anywhere") {
    val p = plan("q_triangles")
    assert(!p.contains("CartesianProduct"), s"triangle plan must stay equi-joined:\n$p")
    assert(p.contains("LeftSemi"), s"wedges must close via a semi join:\n$p")
  }

  test("q_equidepth_bins: no window over the data — rank comes from zipWithIndex") {
    val p = plan("q_equidepth_bins")
    assert(!p.contains("Window"),
      s"global rank must be the zipWithIndex shape, not a window:\n$p")
    assert(!p.contains("Exchange SinglePartition") || p.contains("HashAggregate"),
      s"no single-partition data stage (the final 8-row agg aside):\n$p")
  }

  test("q_neg_sample: bucket equi-join only, positives excluded by anti-join") {
    val p = plan("q_neg_sample")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"negatives must come from the bucket equi-join, never all-pairs:\n$p")
    assert(p.contains("LeftAnti"), s"positives must drop via an anti-join:\n$p")
  }

  test("graph traversals: node-keyed equi-joins, no cartesian, no driver state") {
    for (q <- Seq("q_bfs_reach", "q_pagerank", "q_label_prop", "q_ppr")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q must stay equi-joined:\n$p")
    }
  }

  test("q_skyline: grid-pruned — broadcast prefix join, never a dominance self-join") {
    val p = plan("q_skyline")
    // the oracle's NOT EXISTS is an all-pairs theta join; the plan must
    // instead be windows + ONE broadcast equi-join on the bucket id
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"skyline must never plan the all-pairs dominance join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the per-bucket prefix-min table must broadcast:\n$p")
  }

  test("q_skyline_brand: one brand-keyed window, no join of any kind") {
    val p = plan("q_skyline_brand")
    assert(!p.contains("Join"), s"per-group skyline must be join-free:\n$p")
    assert(p.contains("Window"), s"dominance must be the running-min window:\n$p")
  }

  test("q_skyline3d: cell-pair anti-join verify, no cartesian, pairs broadcast") {
    val p = plan("q_skyline3d")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"3D skyline must verify along the cell-pair equi-join, never all-pairs:\n$p")
    assert(p.contains("LeftAnti"), s"survivors must come from an anti-join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"the cell tables must broadcast:\n$p")
  }

  test("q_dq_checks: the FK dimension broadcasts — fact side never shuffles for it") {
    val p = plan("q_dq_checks")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"FK check must be a broadcast anti-join:\n$p")
  }

  test("q_dsir_select: LM bucket table broadcasts; selection is TakeOrdered") {
    val p = plan("q_dsir_select")
    assert(p.contains("BroadcastHashJoin"),
      s"the ≤buckets-row term table must broadcast over the token stream:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k selection must be TakeOrdered, never a global sort:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_auc: rank window runs over score-level aggregates, not data rows") {
    val p = plan("q_auc")
    // HashAggregate on (grp, score) BELOW the window: the plan string lists
    // the window's child subtree after it — assert both operators exist and
    // no cartesian/broadcast-nested-loop crept in.
    assert(p.contains("Window") &&
      "HashAggregate".r.findAllIn(p).size >= 2, s"missing pre-window combine:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("whole-stage codegen covers the scalar pipelines") {
    // AQE prints codegen stages only in the FINAL plan — execute first.
    val df = SparkEntry.queries("q_scalar_string")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // codegen stages print as "*(n) Operator" in the final plan
    assert(p.contains("*(1)"), s"scalar pipeline fell out of codegen:\n$p")
  }

  test("q_kendall_tau: grid decomposition plans no cartesian, ranges broadcast") {
    val p = plan("q_kendall_tau")
    assert(!p.contains("CartesianProduct"), s"grid Kendall must never go all-pairs:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"per-group ranges must broadcast:\n$p")
  }

  test("q_spearman: level-keyed midrank joins, no cartesian, no data-row window") {
    val p = plan("q_spearman")
    assert(!p.contains("CartesianProduct"))
    // the rank windows partition by (g) over LEVEL rows after aggregates:
    // the plan must show HashAggregate BEFORE any Window in the chain
    assert(p.indexOf("HashAggregate") >= 0 && p.contains("Window"))
  }

  test("q_token_drift: one token-keyed join, per-source frames broadcast") {
    val p = plan("q_token_drift")
    assert(!p.contains("CartesianProduct"))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1 ||
      p.contains("BroadcastNestedLoopJoin"),
      s"source totals must broadcast:\n$p")
  }

  test("q_phash_neardup: band-bucket equi-join only — no cartesian, no nested loop") {
    val p = plan("q_phash_neardup")
    assert(!p.contains("CartesianProduct"), s"dHash candidates must come from bands:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the pair join must stay an equi-join on (band, value):\n$p")
  }

  test("q_itemsets: id- and item-keyed equi-joins only") {
    val p = plan("q_itemsets")
    assert(!p.contains("CartesianProduct"),
      s"Apriori must never cross the vocabulary:\n$p")
  }

  test("q_trimmed_mean: level aggregate precedes the rank window (no data-row sort)") {
    val p = plan("q_trimmed_mean")
    assert(!p.contains("CartesianProduct"))
    val aggIdx = p.indexOf("HashAggregate")
    val winIdx = p.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0,
      s"expected level aggregate + level window:\n$p")
  }

  test("q_ks_drift: the groups×levels grid stays broadcast — no cartesian, no data shuffle join") {
    val p = plan("q_ks_drift")
    assert(!p.contains("CartesianProduct"),
      s"the dense grid must build via broadcast, never a shuffled cartesian:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"every grid join is level-sized and must broadcast:\n$p")
  }

  test("q_token_shift: TakeOrdered cut, never a full global sort before the limit") {
    val p = plan("q_token_shift")
    assert(p.contains("TakeOrdered"),
      s"the top-k must plan as TakeOrdered over the vocabulary:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_ivfpq_topk: probes/LUT broadcast — no sort-merge join, no cartesian anywhere") {
    val p = plan("q_ivfpq_topk")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"),
      s"encoded rows must join broadcast probes/LUT only:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"assignment/probe/LUT joins must broadcast:\n$p")
  }

  test("q_skyline_group3d: one group-keyed merge over frontier candidates, no cartesian") {
    val p = plan("q_skyline_group3d")
    assert(!p.contains("CartesianProduct"),
      s"the dominance verify must stay group-equi-keyed:\n$p")
  }

  test("q_vocab_richness: pure aggregate chain — no join at all") {
    val p = plan("q_vocab_richness")
    assert(!p.contains("Join"), s"richness is two hash aggregates:\n$p")
  }

  test("q_t_closeness: global distribution broadcasts; no cartesian") {
    val p = plan("q_t_closeness")
    assert(!p.contains("CartesianProduct"))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"value-keyed global counts and group totals must broadcast:\n$p")
  }

  test("q_quality_rules: single scan, join-free, no mid-plan exchange (in-row fold)") {
    val p = plan("q_quality_rules")
    assert(!p.contains("Join"), s"quality rules must not join:\n$p")
    assert(!p.contains("Window"), s"the top-2-gram mode is an in-row fold, not a window:\n$p")
    assert("Scan parquet".r.findAllIn(p).size == 1, s"one documents scan only:\n$p")
    // allowed exchanges: docs()'s round-robin input spread + the gate's
    // presentation sort — never a hash (aggregation/join) shuffle
    assert(!p.contains("hashpartitioning"), s"map-side operator must not hash-shuffle:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 2, s"unexpected exchanges:\n$p")
    // the expensive per-row signals evaluate ONCE: the run-length fold
    // (`aggregate(array_sort(...)`) must appear exactly once in the plan,
    // not re-inlined per struct field
    assert("aggregate\\(array_sort".r.findAllIn(p).size == 1,
      s"top-2-gram fold re-inlined:\n$p")
  }

  test("q_lang_ngram: profiles and language list broadcast; no cartesian, no shuffled profile join") {
    val p = plan("q_lang_ngram")
    assert(!p.contains("CartesianProduct"), s"langs fanout must broadcast:\n$p")
    // profile lookup is a broadcast hash join on (lang, gram); the tiny
    // language list fans out via a broadcast nested loop
    assert(p.contains("BroadcastHashJoin"), s"profiles must broadcast:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"language list must broadcast:\n$p")
  }

  test("q_tokenizer_fertility: vocab-keyed equi-join, no cartesian, no per-doc segmentation") {
    val p = plan("q_tokenizer_fertility")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"segment table must join word-keyed, never all-pairs:\n$p")
    // Segmentation runs ONCE over the vocabulary-bounded word table: the
    // merge-replay fold (nested `aggregate`) must sit above a word-level
    // AGGREGATE, not on per-document rows — exactly one occurrence of the
    // fold in the whole plan.
    assert("aggregate\\(\\[named_struct".r.findAllIn(p).size <= 1,
      s"the merge-replay fold must appear once (vocab-bounded), not per-doc:\n$p")
  }

  test("q_ivfpq_curve + _dims: every config branch broadcasts probes/LUT — no cartesian") {
    // The r18 split: q_ivfpq_curve = 3 nProbe configs, q_ivfpq_curve_dims
    // = 4 m/codebook configs. Per config: probes + LUT broadcast onto the
    // encoded side (2 BHJ each); the only sort-merge joins allowed are
    // pairSetPrf's FULL OUTER judge joins (full outer cannot broadcast)
    // — pair-set sized, never data-sized.
    for ((name, nConfigs) <- Seq("q_ivfpq_curve" -> 3, "q_ivfpq_curve_dims" -> 4)) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"no all-pairs in $name:\n$p")
      assert("BroadcastHashJoin".r.findAllIn(p).size >= 2 * nConfigs,
        s"probes/LUT must broadcast in every $name branch:\n$p")
      assert("SortMergeJoin".r.findAllIn(p).size <=
        "FullOuter".r.findAllIn(p).size,
        s"a non-judge sort-merge join appeared on $name's encoded side:\n$p")
    }
  }

  test("q_ngram_jaccard_capped: hot-token table broadcasts; no cartesian; " +
    "the join pipeline stays the Packed zero-index-shuffle shape") {
    val p = plan("q_ngram_jaccard_capped")
    assert(!p.contains("CartesianProduct"), s"no all-pairs:\n$p")
    // capTokenDf's small-hot path: per-block hot arrays ride a broadcast
    // join onto the corpus — the cap must never shuffle the corpus itself.
    assert(p.contains("BroadcastHashJoin"), s"hot table must broadcast:\n$p")
  }

  test("q_stream_ks_drift/chi_square counts close over broadcast-joined " +
    "normalizers — no cartesian in the FromCounts formulas") {
    for (name <- Seq("q_ks_drift", "q_chi_square")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name FromCounts formula must not form an all-pairs product:\n$p")
    }
  }

  test("q_snapshot_read: filters push into the manifest-pinned parquet scan") {
    val df = SparkEntry.queries("q_snapshot_read")(spark, sf0001)
    val filtered = df.filter(df("n_nationkey") > 10)
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(n_nationkey"),
      s"snapshot reads must keep native pushdown:\n$p")
  }

}
