package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the scale properties SURVEY §4
  * claims are asserted here against the actual physical plans, so a
  * refactor that silently reintroduces an O(n²) join or a
  * #queries-partition window fails the suite, not a 100 TB run.
  */
class PlanGuardSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("near-dup, ANN, and interval-join candidate generation never plans a cartesian or nested-loop join") {
    // q84 is the range-join case: the naive non-equi form IS a BNLJ,
    // and the grid rewrite must keep it an equi-join on the cell.
    // q42/q44 are memoized behind a checkpoint that HIDES their
    // candidate join from the public query's plan (the CLAUDE.md
    // checkpoint-hides-subtree lesson) — the guard targets their
    // UNCACHED cores directly, where the join shape is visible.
    val plans = Seq("q41_ngram_jaccard", "q43_simhash", "q84_session_overlap",
        "q51_knn_lsh", "q54_knn_graph",
        "q86_fuzzy_decontaminate", "q95_source_overlap", "q101_dedup_agreement",
        "q155_phash_neardup", "q156_crossmodal_gate").map(q => q -> plan(q)) ++ Seq(
      "q42 uncached core" ->
        operators.Dedup.mhPairsUncached(spark, sf).queryExecution.executedPlan.toString,
      "q44 uncached core" ->
        operators.Dedup.semPairsUncached(spark, sf).queryExecution.executedPlan.toString,
      // r13: hamming64Pairs checkpoints its pair frame before the
      // presentation sort, which hides the banding join from
      // q43/q155/q157/q171's own plans — guard the shared core
      // directly (the same uncached-core pattern as q42/q44)
      "hamming64Pairs core" ->
        operators.Dedup.hamming64PairsCore(operators.Dedup.simhashes(spark, sf), 8)
          .queryExecution.executedPlan.toString)
    for ((q, p) <- plans) {
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
  }

  test("ANN ranking uses the bounded aggregate, never a #queries-partition window") {
    for (q <- Seq("q50_knn_brute", "q51_knn_lsh", "q52_knn_ivf")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q ranks through a window operator")
    }
  }

  test("attribution, rules, and fk audit join on keys, never a cartesian") {
    // q118's touch join is equi on user_id with the range as a post
    // filter; q121's pair join is equi on l_orderkey; q126's audits
    // are equi FK joins. The one-row stat frames (q121 tot, q125
    // sel/stats) legitimately combine via a broadcast nested-loop
    // LEFT JOIN ON true — a cartesian of 1×1 frames, bounded by
    // construction — so only CartesianProduct is banned there.
    for (q <- Seq("q118_attribution", "q121_assoc_rules",
        "q125_purchase_cadence", "q126_fk_audit")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
    // and the corpus-sized joins must not be nested-loop at all
    for (q <- Seq("q118_attribution")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
  }

  test("hybrid retrieval, drift matrix, and cluster-safe split join on keys, never a cartesian") {
    // q160's 1-row corpus-stats frame combines via the bounded
    // broadcast crossJoin (q78's pattern), so only CartesianProduct
    // is banned there; q162's pair frame is an equi-join on the dim
    // index and q161 attaches the representative bucket by equi-join
    // on cluster_id — neither may plan any nested-loop join.
    val p160 = plan("q160_hybrid_retrieval")
    assert(!p160.contains("CartesianProduct"), "q160 plans a cartesian product")
    for (q <- Seq("q162_embedding_drift", "q161_cluster_safe_split")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
  }

  test("scd2 history and windowed funnel stay one-shuffle window plans") {
    // both claim ONE key shuffle: no join operator may appear at all.
    // (q124's closing global agg legitimately collapses its few
    // partial-agg rows to one partition; the guard is on joins.)
    for (q <- Seq("q117_scd2_history", "q124_funnel_windows")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q plans a join it does not need")
    }
  }

  test("semantic dedup and decontamination join on keys, never a cartesian") {
    for (q <- Seq("q45_semantic_dedup", "q69_decontaminate")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
  }

  test("sequence packing plans no window and no global collapse") {
    // the naive form is a global (un-partitioned) running-sum window;
    // the two-phase prefix sum must plan neither a Window nor a
    // single-partition exchange
    val p = plan("q74_pack_sequences")
    assert(!p.contains("Window"), "q74 fell back to a window running sum")
    assert(!p.contains("Exchange SinglePartition"), "q74 collapses to one partition")
  }

  test("mixture sampling never collapses to a single partition") {
    // admission is a broadcast-join filter; the only window runs on
    // the per-language boundary-bucket slice (a partitioned window),
    // so no single-partition exchange may appear
    val p = plan("q72_mix_budget")
    assert(!p.contains("Exchange SinglePartition"), "q72 plans a global window/exchange")
  }

  test("q06's filters reach the parquet scan") {
    val p = plan("q06_forecast_revenue")
    assert(p.contains("PushedFilters: [IsNotNull") || p.contains("PushedFilters: [Gr"),
      s"no pushed filters in scan:\n$p")
  }

  test("repeated-span detection windows stay hash-partitioned, never global") {
    val p = plan("q81_repeated_spans")
    assert(!p.contains("Exchange SinglePartition"), s"q81 plans a global exchange: $p")
    assert(!p.contains("CartesianProduct"), "q81 plans a cartesian product")
  }

  test("PQ ANN plans neither a cartesian join nor a ranking window") {
    val p = plan("q53_knn_pq")
    assert(!p.contains("CartesianProduct"), "q53 plans a cartesian product")
    assert(!p.contains("BroadcastNestedLoopJoin"), "q53 plans a nested-loop join")
    assert(!p.contains("Window"), "q53 ranks through a window operator")
  }

  test("bloom decontamination's train pass is map-only") {
    // the reference side is a bounded checkpointed sketch build; the
    // TRAIN side (the 100 TB side) must plan no hash or single-
    // partition exchange — only the rebalance and the output sort
    val p = plan("q77_bloom_decontaminate")
    val exchanges = "Exchange (hashpartitioning|SinglePartition)".r.findAllIn(p).size
    assert(exchanges == 0, s"q77 shuffles the train corpus: $p")
  }

  test("BM25 ranks via TakeOrderedAndProject, not a sort or window") {
    val p = plan("q78_bm25")
    assert(p.contains("TakeOrderedAndProject"), s"q78 lost its top-k plan: $p")
    assert(!p.contains("Window"), "q78 ranks through a window operator")
  }

  test("corpus card: corpus subtree sits behind a checkpoint barrier, scanned once") {
    // r4: the card aggregate is localCheckpointed before the
    // crossJoin consumes it twice (rows + grand total), so the
    // corpus scan + md5 dup window executes exactly once at
    // materialization and the FINAL plan must reference only the
    // checkpointed RDD — a parquet FileScan reappearing here means
    // the barrier was dropped and the corpus subtree runs per branch
    val p = plan("q79_corpus_card")
    assert(p.contains("Scan ExistingRDD"), s"q79 lost its checkpoint barrier: $p")
    assert(!p.contains("FileScan"), s"q79 re-scans the corpus outside the checkpoint: $p")
    val singles = "Exchange SinglePartition".r.findAllIn(p).size
    assert(singles <= 1, s"q79 plans $singles single-partition exchanges: $p")
  }

  test("chunking is map-only; fixed-count sampling ranks via the bounded aggregate") {
    // q82: explode of a per-row sequence — no hash or single-
    // partition exchange may appear (rebalance + output range sort
    // are the only exchanges)
    val p82 = plan("q82_chunk_overlap")
    val ex = "Exchange (hashpartitioning|SinglePartition)".r.findAllIn(p82).size
    assert(ex == 0, s"q82 shuffles data it should only flatMap: $p82")
    // q83: the fixed-count sample must rank through the k-bounded
    // aggregate, never a |langs|-partition row_number window
    val p83 = plan("q83_sample_per_stratum")
    assert(!p83.contains("Window"), s"q83 ranks through a window operator: $p83")
    assert(p83.contains("ObjectHashAggregate"), s"q83 lost the bounded top-k aggregate: $p83")
  }

  test("importance sampling shuffles nothing but 5-row language partials") {
    // q88's keep test is a per-row integer filter; the only exchange
    // is the partial→final hop of the tiny language aggregate
    val p = plan("q88_importance_sample")
    val ex = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(ex <= 1, s"q88 plans $ex hash exchanges — the keep test leaked a shuffle: $p")
    assert(!p.contains("Exchange SinglePartition"), s"q88 collapses to one partition: $p")
    assert(!p.contains("Window"), s"q88 plans a window: $p")
  }

  test("keyword extraction joins on term and ranks per doc, never cartesian or global") {
    val p = plan("q90_keywords")
    assert(!p.contains("CartesianProduct"), "q90 plans a cartesian product")
    // the 1-row doc-count side must come in as a broadcast, not a
    // shuffled join
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"q90 shuffles the 1-row corpus count: $p")
    // the per-doc rank window is the many-partition shape — fine —
    // and the ONE legitimate single-partition exchange is the 1-row
    // corpus-count aggregate feeding the broadcast; a second one
    // means the scored stream itself collapsed
    val singles = "Exchange SinglePartition".r.findAllIn(p).size
    assert(singles <= 1, s"q90 plans $singles single-partition exchanges: $p")
  }

  test("pagerank rounds join on keys over checkpointed leaves, never cartesian") {
    val p = plan("q91_graph_centrality")
    assert(!p.contains("CartesianProduct"), "q91 plans a cartesian product")
    assert(!p.contains("BroadcastNestedLoopJoin"), "q91 plans a nested-loop join")
    // all leaves of the iteration are checkpointed RDDs; a FileScan
    // in the loop plan means the q54 subtree re-executes per round
    assert(!p.contains("FileScan"), s"q91 re-reads parquet inside the iteration plan: $p")
  }

  test("vocab growth windows only the bucket frame; triplet mining aggregates, never windows") {
    // q93: the ONE single-partition exchange is the n/1000-row bucket
    // frame's running sum — the corpus itself must reach it only
    // through hash aggregates
    val p93 = plan("q93_vocab_growth")
    val singles = "Exchange SinglePartition".r.findAllIn(p93).size
    assert(singles <= 1, s"q93 plans $singles single-partition exchanges: $p93")
    assert(!p93.contains("CartesianProduct"), "q93 plans a cartesian product")
    // q94: per-query argmax is a struct-max AGGREGATE — a window here
    // would re-shuffle the scored edges a second time
    val p94 = plan("q94_triplet_mining")
    assert(!p94.contains("Window"), s"q94 ranks through a window operator: $p94")
    assert(!p94.contains("CartesianProduct"), "q94 plans a cartesian product")
    assert(!p94.contains("BroadcastNestedLoopJoin"), "q94 plans a nested-loop join")
  }

  test("LM scoring, novelty, and diversity sampling keep their aggregate shapes") {
    // q96: LM tables join via equi-keys; the 1-row vocab count rides
    // a broadcast — nothing may plan cartesian
    val p96 = plan("q96_lm_score")
    assert(!p96.contains("CartesianProduct"), "q96 plans a cartesian product")
    // q97: two wordcount-shaped groupBys + an equi-join; no cartesian,
    // no single-partition collapse beyond the output sort
    val p97 = plan("q97_novelty")
    assert(!p97.contains("CartesianProduct"), "q97 plans a cartesian product")
    assert(!p97.contains("BroadcastNestedLoopJoin"), "q97 plans a nested-loop join")
    assert(!p97.contains("Exchange SinglePartition"), s"q97 collapses to one partition: $p97")
    // q98: per-cell ranking through the bounded TopK aggregate, never
    // a #cells-partition window
    val p98 = plan("q98_diversity_sample")
    assert(!p98.contains("Window"), s"q98 ranks through a window operator: $p98")
    assert(p98.contains("ObjectHashAggregate"), s"q98 lost the bounded top-k aggregate: $p98")
  }

  test("corpus reports join on keys, never a data-sized cartesian; q104 fuses all widths into one Generate") {
    // q102/q103/q106/q109: the only non-equi joins allowed are the
    // one-row broadcast (BroadcastNestedLoopJoin over a 1-row agg is
    // the crossJoin(broadcast(...)) idiom, bounded by construction)
    for (q <- Seq("q103_length_histogram", "q104_ngram_diversity",
        "q106_source_shift", "q109_dup_rate_curve")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
    // one corpus pass for all four gram widths: a second Generate
    // would mean the fused (n, gram) explode regressed to per-width scans
    val gen = "\\bGenerate\\b".r.findAllIn(plan("q104_ngram_diversity")).length
    assert(gen == 1, s"q104 plans $gen Generate nodes, expected 1")
    // validation summaries: no cartesian, and q107's flags are one pass
    for (q <- Seq("q107_embedding_validate", "q108_intake_validate")) {
      assert(!plan(q).contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("r5 operators: no cartesian, no data-sized nested-loop, rank machinery parallel") {
    // q132/q138 ride the inverted index; q131's window-day join is
    // equi after the bounded explode; q135's vocab joins are equi;
    // q134/q136 compose q65. The only nested-loop allowed anywhere
    // here is the 1-row broadcast LEFT JOIN ON true idiom.
    for (q <- Seq("q128_abc_analysis", "q129_price_demand", "q131_rolling_actives",
        "q132_ngram_containment", "q134_dedup_bias", "q136_cluster_sizes",
        "q137_cohort_ltv", "q138_incremental_dedup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
    for (q <- Seq("q131_rolling_actives", "q132_ngram_containment",
        "q138_incremental_dedup")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
    // the grouped-rank/ntile machinery must stay parallel on the
    // DATA-sized side: rows range-partition by the sort key and the
    // offsets come back via broadcast. (The nPart-row offset table's
    // own cumulative window legitimately plans a single-partition
    // exchange — tiny by construction — so that string is not
    // banned here.)
    for (q <- Seq("q130_revenue_gini", "q133_curriculum")) {
      val p = plan(q)
      assert(p.contains("Exchange rangepartitioning"),
        s"$q lost the range-partitioned parallel ranking: $p")
      assert(p.contains("BroadcastExchange"), s"$q lost the broadcast offset join: $p")
    }
  }

  test("late-r6 operators keep their scale shapes") {
    // q168: the ONLY nested-loop is the bounded broadcast eval set
    // (intended — no join key exists), and the argmax must stay in
    // hash aggregation: max(struct) would silently demote it to a
    // SortAggregate over the n×|Q| scored frame
    val p168 = plan("q168_semantic_decon")
    assert(p168.contains("BroadcastNestedLoopJoin"), "q168 lost its broadcast eval-set join")
    assert(!p168.contains("CartesianProduct"), "q168 plans a cartesian")
    assert(!p168.contains("SortAggregate"), "q168's argmax fell out of hash aggregation")
    // q169/q170: one corpus scan collapsed map-side; any window runs
    // over the tiny band/shard frame AFTER the agg, so the plan has
    // exactly one data-sized hash exchange (the group-by)
    for (q <- Seq("q169_quality_ladder", "q170_shard_manifest")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q plans a join")
      val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(hashEx <= 1, s"$q shuffles more than the single group-by: $p")
    }
    // q171: banding join only — no cartesian, no nested loop
    val p171 = plan("q171_image_families")
    assert(!p171.contains("CartesianProduct") && !p171.contains("BroadcastNestedLoopJoin"),
      "q171 plans an all-pairs join")
  }

  test("r7 schedule/audit operators keep their scale shapes") {
    // q177/q178: everything past the (cached-label + corpus scan)
    // joins is a #sources/#bands-row frame; the totals join must be
    // a 1-row BROADCAST (left-on-true, the q107 empty-frame rule) —
    // never a cartesian, never a data-sized window
    for (q <- Seq("q177_epoch_plan", "q178_dup_quality")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian")
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
        s"$q lost its broadcast totals join: $p")
      assert(!p.contains("Window"), s"$q plans a window")
    }
  }

  test("histogram-selection queries ride the two-phase cumsum core, never a one-task ordered window") {
    // r7: q125/q139/q141/q145/q148 migrated onto q123's
    // range-partitioned cumulative (ops.globalCumsum /
    // groupedGlobalCumsum). The data-sized cumulative must show the
    // range partitioning + broadcast offsets; the only legitimate
    // single-partition exchange left is the nPart-row offset table's
    // own cumulative window (and 1-row report assembly frames).
    // A localCheckpoint'ed frame's plan leaves are the checkpoint
    // RDD scan (CLAUDE.md lesson), so the helper's rangepartitioning
    // is INVISIBLE in the final plan; what distinguishes the
    // two-phase form from the one-task window is the checkpoint
    // barrier itself (Scan ExistingRDD — the bad form has none) plus
    // the broadcast offset join. The multi-group queries keep a
    // trailing presentation orderBy, whose rangepartitioning is
    // additionally asserted.
    // q174's bucket frame is corpus-tracking (nDocs/1000 rows), so it
    // rides the N-value variant (globalCumsumN) — same guard shape.
    for (q <- Seq("q123_exact_percentiles", "q125_purchase_cadence",
        "q139_ship_latency", "q141_robust_anomaly", "q145_index_stats",
        "q148_session_funnel", "q174_quality_curve")) {
      val p = plan(q)
      assert(p.contains("Scan ExistingRDD"),
        s"$q lost the two-phase cumsum's checkpoint barrier: $p")
      assert(p.contains("BroadcastExchange"), s"$q lost the broadcast offset join: $p")
    }
    for (q <- Seq("q123_exact_percentiles", "q139_ship_latency", "q141_robust_anomaly")) {
      val p = plan(q)
      assert(p.contains("Exchange rangepartitioning"),
        s"$q lost its parallel output ordering: $p")
    }
  }

  test("map-only operators plan no data exchange beyond the rebalance and final sort") {
    // q66 is a pure per-row projection: its only exchanges are the
    // documents rebalance (round-robin) and the output orderBy
    for (q <- Seq("q66_train_split", "q64_pii_scrub",
        "q71_repetition", "q73_media_features", "q85_normalize_text")) {
      val p = plan(q)
      val exchanges = "Exchange (hashpartitioning|SinglePartition)".r.findAllIn(p).size
      assert(exchanges == 0, s"$q shuffles data it should only map: $p")
    }
  }
}
