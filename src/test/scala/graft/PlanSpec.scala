package graft

/** Plan-quality regression tests: the properties that matter at 100 TB,
  * asserted on the physical plans of representative catalog queries at
  * sf0.001 (plan shape is scale-invariant; only stats-driven join picks
  * could differ, and those are asserted where AQE can't flip them).
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString()

  test("filters are pushed to the parquet scan (q08)") {
    val p = plan("q08_int_filters")
    assert("PushedFilters: \\[(?!\\])".r.findFirstIn(p).nonEmpty,
      "int filters must reach the scan")
  }

  test("projection pruning reaches the scan (q01 reads only needed columns)") {
    val p = plan("q01_pricing_summary")
    // lineitem has 16 columns; q01 needs 7 — comment/shipmode etc must not
    // be in the read schema
    assert(!p.contains("l_comment") && !p.contains("l_shipmode"),
      "unused columns must be pruned from ReadSchema")
  }

  test("small dimensions broadcast (q17, q27)") {
    assert(plan("q17_join_broadcast").contains("BroadcastHashJoin"))
    val star = plan("q27_join_star")
    assert(star.contains("BroadcastHashJoin"))
  }

  test("exact top-k plans as TakeOrderedAndProject, not a global sort (q13)") {
    assert(plan("q13_topk").contains("TakeOrderedAndProject"))
  }

  test("native expressions appear fused, not inlined per consumer") {
    // q35: ONE graft_minhash call feeding the limit (CollapseProject would
    // have produced 4 copies in a per-column formulation)
    val p35 = plan("q35_minhash_signature")
    val calls = "graft_minhash".r.findAllIn(p35).size
    assert(calls >= 1 && calls <= 2, s"expected 1 fused graft_minhash, saw $calls")
    // q43: simhash is the native expression, and no interpreted HOF lambda
    // survives in the plan
    val p43 = plan("q43_simhash")
    assert(p43.contains("graft_simhash"))
    assert(!p43.contains("lambdafunction"), "no interpreted HOFs in the simhash path")
  }

  test("jaccard verify ships hashed shingles, not shingle strings (q37)") {
    val p = plan("q37_ngram_jaccard")
    assert(p.contains("graft_shingle_hash"))
  }

  test("skewed linkage actually salts: join keys include __salt, dim side " +
      "replicates (q197)") {
    val p = plan("q197_skewed_linkage")
    assert(p.contains("__salt"), "the hot block must scatter over salt keys")
    assert(!p.contains("CartesianProduct"), "blocking stays an equi-join")
  }

  test("skew quota cap runs two windows, both partitioned (q198)") {
    val p = plan("q198_skew_quota_cap")
    val windows = "row_number".r.findAllIn(p).size
    assert(windows >= 2, s"expected pre-cap + exact windows, saw $windows")
    assert(p.contains("__salt"), "phase 1 must partition by (key, salt)")
  }

  test("bloom decontam probes via codegen, not a row UDF (q78)") {
    val p = plan("q78_bloom_decontam")
    assert(p.contains("graft_bloom_contains"),
      "the probe must be the native expression")
    assert(!p.toLowerCase.contains("lambdafunction") && !p.contains("UDF("),
      "no per-row lambda in the bloom probe stage")
  }

  test("PII query takes the top-k BEFORE the regex projection (q61)") {
    // the regex projection commutes with ORDER BY c_custkey LIMIT 200, so
    // the plan must be Project(regex) over TakeOrderedAndProject — the
    // expensive expressions run on 200 rows, not the whole table
    val p = plan("q61_pii_redact")
    assert(p.contains("TakeOrderedAndProject"),
      "limit must plan as TakeOrdered under the regex projection")
  }

  test("k-means assignment is a shuffle-free projection") {
    import org.apache.spark.sql.functions.col
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val assigned = graft.operators.Similarity.kmeansAssign(
      emb, "vec_id", "embedding", nClusters = 4, iters = 1)
    val p = assigned.queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"),
      "trained-codebook assignment must not shuffle — centroids are literals")
    // and the model actually trained: assignment differs from seeds for
    // at least the non-seed vectors (sanity, not a plan property)
    assert(assigned.filter(col("cluster") >= 0).count() == emb.count())
  }

  test("quota cap is one key shuffle plus the output sort (q65)") {
    val p = plan("q65_source_cap")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected key-window + final-sort exchanges, saw $exchanges")
    assert(p.contains("Window") || p.contains("RunningWindowFunction"))
  }

  test("interval join plans as an equi-join, never a nested loop (q77)") {
    val p = plan("q77_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the bucketed rewrite exists to avoid the theta-join nested loop")
  }

  test("bigram LM broadcasts the trained model onto the corpus (q75)") {
    val p = plan("q75_bigram_lm")
    assert(p.contains("BroadcastHashJoin"),
      "the vocab-bounded model must broadcast; the corpus side must not shuffle for scoring")
  }

  test("score-band window runs over the distinct-value aggregate, not rows (q79)") {
    // the single-partition window is fed by HashAggregate (distinct
    // scores), never directly by the row scan
    val p = plan("q79_score_deciles")
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0, "expected the cutoff window")
    val below = p.substring(winIdx)
    assert(below.contains("HashAggregate"),
      "window input must be the distinct-score aggregate")
    // and the row-side join of cutoffs is a broadcast, not a shuffle
    assert(p.contains("BroadcastHashJoin"))
  }

  test("bloom decontam: filter prunes before a shuffle join, output join is not broadcast (q78)") {
    val p = plan("q78_bloom_decontam")
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      "verify join must exercise the big-benchmark (non-broadcast) path")
  }

  test("chunk dedup discovers first-occurrences via partial aggregation, not a window (q76)") {
    val p = plan("q76_chunk_dedup")
    assert(!p.contains("RunningWindowFunction") &&
      "Window\\b".r.findFirstIn(p).isEmpty,
      "min(struct) discovery must partial-aggregate; a row window would serialize hot chunks")
  }

  test("setsim join: every join is an equi-join, shingles are the fused native pass (q85)") {
    val p = plan("q85_setsim_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "prefix filtering exists to avoid the all-pairs theta join")
    assert(p.contains("graft_shingle_hash"),
      "shingle sets must travel as hashes from the native pass")
  }

  test("z-order key is a pure projection; the query is scan→agg→sort (q86)") {
    val p = plan("q86_zorder")
    assert(!p.contains("Join"), "z-value needs no join")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected only the groupBy + orderBy exchanges, saw $exchanges")
  }

  test("char entropy fuses into the scan: no shuffle before the sort (q87)") {
    val p = plan("q87_char_entropy")
    assert(p.contains("graft_char_entropy"))
    assert(!p.contains("lambdafunction"), "no interpreted HOFs in the entropy path")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"row-local signal: only the output sort may shuffle, saw $exchanges")
  }

  test("semantic dedup: pair join is an equi-join on the cluster, assignment is the fused fold (q88)") {
    val p = plan("q88_semantic_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "within-cluster pairs must join on the cluster key")
    assert(p.contains("graft_dotw"),
      "centroid assignment must use the fused literal-codebook folds")
  }

  test("attribution inherits the as-of shape: no range explosion, no nested loop (q93)") {
    val p = plan("q93_attribution")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the as-of union+window shape must survive the composition")
  }

  test("rate anomalies window over buckets, counts partial-aggregate (q97)") {
    val p = plan("q97_rate_anomaly")
    assert(p.contains("HashAggregate"), "bucket counts must partial-aggregate")
    assert(p.contains("Window"), "scoring is a window over the bucket axis")
    // densification joins the per-type bucket grid back to the sparse
    // counts — an equi-join on (type, bucket), never a nested loop
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "densification must stay an equi-join")
  }

  test("media round-trip queries are pure projections (q94-q96)") {
    for (name <- Seq("q94_audio_meta", "q95_image_dims", "q96_video_meta")) {
      val p = plan(name)
      assert(!p.contains("Join"), s"$name: synthesis+decode needs no join")
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges <= 1, s"$name: only the output sort may shuffle, saw $exchanges")
    }
  }

  test("correlation matrix is ONE scan: single aggregate, no plan duplication (q102)") {
    val p = plan("q102_corr_matrix")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"all pairwise moments must come from one scan, saw $scans")
  }

  test("heavy hitters: two-phase cap bounds exchanges; count partial-aggregates (q89)") {
    val p = plan("q89_heavy_hitters")
    val exchanges = "Exchange".r.findAllIn(p).size
    // explode→count shuffle, salt window, key window, output sort
    assert(exchanges <= 4, s"expected ≤4 exchanges in the two-phase top-k, saw $exchanges")
    assert(p.contains("HashAggregate"), "token counts must partial-aggregate")
  }

  test("salted join: equi-join on (key, salt); shuffle path stays an equi-join (q107)") {
    // at sf0.001 Spark rightly broadcasts the tiny salted dim — fine. The
    // at-scale claim is about the NON-broadcast path (the only reason to
    // salt): force it and the join must still be a (key, salt) equi-join.
    assert(!plan("q107_salted_join").contains("NestedLoop"))
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan("q107_salted_join")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "salted join must survive as a shuffle equi-join when broadcast is off")
      assert(!p.contains("NestedLoop"), "salt must not break the equi-join")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("BM25: term filter sits under the tf aggregation, stats broadcast (q108)") {
    val p = plan("q108_bm25")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "corpus scalars must ride a broadcast, not a shuffle")
    // the isin() filter must prune non-query tokens before the groupBy
    assert("Filter .*term.*INSET|Filter .*term.* IN".r.findFirstIn(p).nonEmpty ||
      p.contains("INSET"), "query-term filter must prune before aggregation")
  }

  test("sorted neighborhood: rank join and neighbor join are equi-joins (q111)") {
    val p = plan("q111_sorted_neighborhood")
    assert(!p.contains("NestedLoop"),
      "rank-window candidates must come from the explode equi-join, not a range join")
    // no full-data single-partition window: every WindowExec must carry a
    // partition spec (the offsets window runs over |partitions| rows and
    // is allowed; it windows on __pid)
    assert(!p.contains("Window [") || p.contains("windowspecdefinition"),
      "windows must be partitioned")
  }

  test("CMS: matrix rides one broadcast; estimates never shuffle the matrix (q113)") {
    val p = plan("q113_cms_estimates")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 1-row sketch must broadcast onto the probe terms")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      "the typed CMS aggregator partial-aggregates")
  }

  test("quantile family runs on the distinct-value rollup, not raw rows (q110/q114/q115)") {
    for (name <- Seq("q110_mad_outliers", "q114_winsorize", "q115_equidepth_hist")) {
      val p = plan(name)
      // the cumulative window must consume a HashAggregate (the rollup),
      // never sit directly on the scan
      val winIdx = p.indexOf("RunningWindowFunction") match {
        case -1 => p.indexOf("Window")
        case i => i
      }
      assert(winIdx >= 0, s"$name: expected a window in the plan")
      assert(p.contains("HashAggregate"), s"$name: distinct-value rollup missing")
      assert(!p.contains("NestedLoop") || p.contains("BroadcastNestedLoop"),
        s"$name: only broadcast scalar joins allowed")
    }
  }

  test("dedup split is a pure scan-side projection: no shuffle before the count (q116)") {
    val p = plan("q116_dedup_split")
    // split assignment itself adds no exchange beyond the count shuffle +
    // output sort (the doc_id join folds into the same scan or a cheap join)
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 4, s"split must not add shuffles, saw $exchanges")
  }

  test("sliding distinct: fan-out is an equi-shape, no window over raw events (q118)") {
    val p = plan("q118_sliding_distinct")
    assert(!p.contains("Window"), "pair fan-out replaces the running-set window")
    assert(p.contains("Generate explode"), "window-ends come from the explode fan-out")
    assert(!p.contains("NestedLoop") || p.contains("BroadcastNestedLoop"),
      "only the 1-row max-bucket broadcast may nested-loop")
  }

  test("ngram novelty ships hashed shingles; df join is an equi-join (q120)") {
    val p = plan("q120_ngram_novelty")
    assert(p.contains("graft_shingle_hash"))
    assert(!p.contains("NestedLoop"))
  }

  test("event paths: ONE user-key window, counts partial-aggregate (q124)") {
    val p = plan("q124_event_paths")
    // both lags share one window spec -> one Window operator
    val windows = "\\bWindow\\b".r.findAllIn(p).size
    assert(windows <= 2, s"lags must share the user window, saw $windows")
    assert(p.contains("TakeOrderedAndProject") || p.contains("Sort"),
      "top-k over path counts")
  }

  test("trend: one aggregation over the daily rollup, no joins (q125)") {
    val p = plan("q125_trend")
    assert(!p.contains("Join"), "closed-form moments need no join")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"one pass, saw $scans scans")
  }

  test("cluster quality: assignment+score fuse into the scan projection (q126)") {
    val p = plan("q126_cluster_quality")
    assert(!p.contains("Join"), "centroids ride as literals, not a join")
    assert(p.contains("graft_dotw"), "native fused dot for the argmax/score")
  }

  test("column profile: one column-pruned scan per type family, no Expand (q117)") {
    val p = plan("q117_column_profile")
    val scans = "Scan parquet".r.findAllIn(p).size
    // one melt per type family; each scan reads ONLY its own columns, so
    // combined I/O equals a single full scan
    assert(scans == 2, s"expected a numeric + a string melt scan, saw $scans")
    assert(!p.contains("Expand"),
      "exact distincts must come from the (col,value) rollup, not multi-distinct Expand")
    assert(!p.contains("l_orderkey"), "unprofiled columns must be pruned")
  }

  test("window dedup: ONE corpus scan, totals window over the (hash,id) rollup, no join (q129)") {
    val p = plan("q129_window_dedup")
    // windows must not be materialized twice: the per-source report joins
    // documents once, so at most 2 scans (window stream + source lookup)
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, s"expected one exploded scan + source lookup, saw $scans")
    // the per-hash totals window sits on a HashAggregate rollup
    assert(p.contains("Window") && p.contains("HashAggregate"),
      "totals must come from a window over the rollup")
    assert(!p.contains("NestedLoop"), "no cartesian anywhere")
  }

  test("mixture weights: denominator rides a one-row broadcast (q130)") {
    val p = plan("q130_mixture_weights")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "the scalar denominator must broadcast")
    // one aggregation over the group key feeds everything: exactly one
    // scan of documents per branch is acceptable, but no shuffle join
    assert(!p.contains("SortMergeJoin"), "no shuffle join for a scalar")
  }

  test("drift report: binned counts partial-aggregate; extremes and totals broadcast (q131)") {
    val p = plan("q131_drift_report")
    assert(!p.contains("SortMergeJoin"),
      "scalar stats must broadcast, never shuffle-join")
    assert(!p.contains("Window "),
      "no window anywhere — totals come from broadcast aggregates")
    // the bin rollup partial-aggregates before its exchange
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      "binned counts must partial-aggregate map-side")
  }

  test("gini, KS, and AUC run their window over the distinct-value rollup (q134/q135/q144)") {
    for (name <- Seq("q134_gini", "q135_ks_drift", "q144_filter_auc")) {
      val p = plan(name)
      assert(p.contains("Window") && p.contains("HashAggregate"),
        s"$name: prefix sums must consume the rollup aggregate")
      // the raw table is scanned once for the rollup (q135 reads events
      // a second time only for the 2-column global time extent)
      val scans = "Scan parquet".r.findAllIn(p).size
      assert(scans <= 2, s"$name: expected rollup scan (+ extent), saw $scans")
      assert(!p.contains("SortMergeJoin"),
        s"$name: scalar/extent lookups must broadcast")
    }
  }

  test("embedding drift: dim sums partial-aggregate; no raw-vector shuffle keys (q136)") {
    val p = plan("q136_embedding_drift")
    // the exploded (label, dim, micro-int) stream must combine map-side
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      "component sums must partial-aggregate before their exchange")
    assert(!p.contains("SortMergeJoin"),
      "the id-extent scalar and per-label finish must broadcast")
  }

  test("image resize is a pure scan-side projection: zero exchanges before sort (q137)") {
    val p = plan("q137_image_resize")
    // parse → scale → re-synthesize → re-parse all fuse into the scan;
    // the only exchange allowed is the final presentation sort
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"resize must not shuffle, saw $exchanges")
    assert(!p.contains("Window ") && !p.contains("SortMergeJoin"))
  }

  test("cross-corpus dups: band join is an equi-join; text never shuffles (q138)") {
    val p = plan("q138_cross_corpus_dups")
    val exchanges = "Exchange (hashpartitioning|rangepartitioning)[^\\n]*"
      .r.findAllIn(p).toList
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text")),
      s"text must never cross a shuffle: $exchanges")
    assert(!p.contains("NestedLoop"), "band collision must be an equi-join")
  }

  test("split-leakage audit ships signatures and hashed shingles, never text (q133)") {
    val p = plan("q133_split_leakage")
    // candidate generation + verify reuse the dedup shapes: every exchange
    // must carry minhash/shingle-hash/split columns — the raw text column
    // stays inside scan-side projections and never crosses a shuffle
    val exchanges = "Exchange (hashpartitioning|rangepartitioning)[^\\n]*"
      .r.findAllIn(p).toList
    assert(exchanges.nonEmpty, "expected shuffles in the dedup stages")
    assert(!exchanges.exists(_.contains("text")),
      s"text must never be a shuffle key/payload: $exchanges")
  }

  test("corpus overlap: terms/hashes shuffle, raw text never does (q139)") {
    val p = plan("q139_corpus_overlap")
    val exchanges = "Exchange (hashpartitioning|rangepartitioning)[^\\n]*"
      .r.findAllIn(p).toList
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text#")),
      s"text must stay in scan-side projections: $exchanges")
  }

  test("domain relevance: totals ride a broadcast, no driver collect shape (q140)") {
    val p = plan("q140_domain_relevance")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      "the 1-row totals frame must broadcast onto the token stream")
    assert(!"Exchange (hashpartitioning|rangepartitioning)[^\\n]*"
      .r.findAllIn(p).exists(_.contains("text#")),
      "raw text never crosses a shuffle")
  }

  test("vocab coverage: top-V is partial top-k and the vocab broadcasts (q141)") {
    val p = plan("q141_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      "the vocabulary cut must be a partial top-k, not a global sort")
    assert(p.contains("BroadcastHashJoin"),
      "the bounded vocabulary must broadcast onto the occurrence stream")
  }

  test("snapshot diff joins hashes, never text (q146)") {
    val p = plan("q146_snapshot_diff")
    val exchanges = "Exchange (hashpartitioning|rangepartitioning)[^\\n]*"
      .r.findAllIn(p).toList
    assert(exchanges.nonEmpty, "full-outer diff join shuffles on the id")
    assert(!exchanges.exists(_.contains("text#")),
      s"each side must reduce to (id, md5) before the shuffle: $exchanges")
  }

  test("priority sample: partial top-k, no global window over the table (q142)") {
    val p = plan("q142_priority_sample")
    assert(p.contains("TakeOrderedAndProject"),
      "sample + threshold must come from partial top-k")
    assert(!p.contains("Window"),
      "a single-partition ranking window would serialize the table")
  }

  test("PMI collocations: unigram model broadcasts, top-k is partial (q149)") {
    val p = plan("q149_pmi_collocations")
    assert(p.contains("BroadcastHashJoin"),
      "the vocab-sized unigram table must broadcast onto the pair table")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k lift must be a bounded TakeOrdered, not a global sort")
    assert(!p.contains("SortMergeJoin"),
      "no corpus-sized shuffle join belongs in this plan")
  }

  test("NB classifier: model broadcasts; the only corpus shuffles are " +
      "token counts and the doc rollup (q150)") {
    val p = plan("q150_nb_classifier")
    assert(p.contains("BroadcastHashJoin"),
      "the V-row model must broadcast onto the exploded corpus")
    assert(!p.contains("CartesianProduct"),
      "singleton totals must ride BroadcastNestedLoopJoin, never cartesian")
  }

  test("length batches: two-phase rank, no whole-table window partition (q151)") {
    val p = plan("q151_length_batches")
    // the ONLY unpartitioned window allowed is the |partitions|-row offset
    // ladder inside globalRowNumber; per-bucket ranking must come from the
    // range-partitioned two-phase rank, so no Window node may scan parquet
    // directly below itself
    assert(p.contains("RangePartitioning") || p.contains("rangepartitioning"),
      "phase 1 must range-partition on (bucket, key)")
    assert(p.contains("BroadcastHashJoin"),
      "bucket starts and partition offsets must broadcast back")
  }

  test("winnow pairs: fingerprints join on the hash, text never shuffles (q152)") {
    val p = plan("q152_winnow_pairs")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).toList
    assert(exchanges.nonEmpty, "pair generation is a fingerprint equi-join")
    assert(!p.contains("Exchange hashpartitioning(text"),
      "raw text must never be a shuffle key")
    assert(p.contains("TakeOrderedAndProject"),
      "the pair report is a bounded top-k")
  }

  test("bootstrap: draw fan-out is scan-side; one partial-agg shuffle (q148/q153)") {
    for (q <- Seq("q148_bootstrap_means", "q153_bootstrap_ci")) {
      val p = plan(q)
      assert(p.contains("graft_boot_counts"),
        s"$q must use the native batched-draw expression")
      assert(!p.contains("CartesianProduct"),
        s"$q: the replicate fan-out must be a generator, not a join")
    }
  }

  test("CDC chunking: dup counts join 16-byte hashes, chunk text never " +
      "shuffles past its own doc (q158)") {
    val p = plan("q158_cdc_dedup")
    assert(!p.contains("Exchange hashpartitioning(t#") &&
      !p.contains("Exchange hashpartitioning(text"),
      "raw token/text columns must not be shuffle keys")
    assert(!p.contains("CartesianProduct"))
  }

  test("data card: every finisher joins source-keyed rollups; the majority " +
      "window runs over lang counts, not the corpus (q161)") {
    val p = plan("q161_data_card")
    // the only Window in the plan must sit above an aggregate (lang
    // counts), never directly above the parquet scan
    assert(p.contains("Window"), "majority-language pick uses a window")
    assert(!p.contains("CartesianProduct"))
  }

  test("join estimate: sketches reduce map-side; matrices ride broadcasts " +
      "(q162)") {
    val p = plan("q162_join_estimate")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate") ||
      p.contains("HashAggregate"), "CMS matrices come from partial aggregation")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "1-row matrices and audits must ride broadcasts")
  }

  test("DSIR: bounded feature tables broadcast; no cartesian shapes (q173)") {
    val p = plan("q173_dsir_weights")
    assert("BroadcastExchange".r.findAllIn(p).size >= 2,
      "target/raw feature tables (<= buckets rows) and totals must broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"), "top-k is partial, not a global sort")
  }

  test("PageRank: inflow sums partial-aggregate; only equi-joins (q174)") {
    val p = plan("q174_pagerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "every PR round is equi-join + partial agg — nothing quadratic")
    assert(p.contains("TakeOrderedAndProject"))
    // the damping update must not re-derive the node count per row: the
    // count is a driver literal, so no scalar-subquery node survives
    assert(!p.toLowerCase.contains("subquery"), "node count is a driver literal")
  }

  test("JL distortion: probe filter pushes to the scan; corpus read once " +
      "per consumer, never joined at full width (q175)") {
    val p = plan("q175_jl_distortion")
    assert("PushedFilters: \\[In\\(vec_id".r.findFirstIn(p).nonEmpty ||
      p.contains("vec_id IN"), "probe-id filter must reach the parquet scan")
    assert(!p.contains("CartesianProduct"))
  }

  test("purged split: bounds and purge set ride broadcasts; one label " +
      "rollup shuffle (q176)") {
    val p = plan("q176_purged_split")
    assert("BroadcastExchange".r.findAllIn(p).size >= 2,
      "2-long bounds and the embargo-entity set must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("record linkage: blocking is an equi-join, comparisons are " +
      "scan-side (q177)") {
    val p = plan("q177_record_linkage")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "the block key must drive an equi-join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "no all-pairs shapes — blocking bounds the candidate set")
  }

  test("dup spans: grams ship as md5 hashes, text never shuffles; windows " +
      "partition by doc (q178)") {
    val p = plan("q178_dup_spans")
    assert(!p.contains("CartesianProduct"))
    assert(!p.toLowerCase.contains("no partition defined"),
      "span windows must be doc-partitioned")
    // the df join keys on the 32-char hash, not raw text: no `text` column
    // survives past the scan projection into an Exchange
    val exchanges = p.split("Exchange").drop(1)
    assert(exchanges.forall(e => !e.take(200).contains("text#")),
      "shuffles must carry hashes and positions, never document text")
  }

  test("containment: pair fan-out is hash-keyed; df cap applies before " +
      "the pair join (q180)") {
    val p = plan("q180_containment")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("silhouette: centroid rows broadcast; distances partial-aggregate " +
      "(q179)") {
    val p = plan("q179_silhouette")
    assert(p.contains("BroadcastExchange"), "8 centroid rows must broadcast")
    assert(!p.contains("CartesianProduct"))
    assert("PushedFilters: \\[.*LessThan\\(vec_id".r.findFirstIn(p).nonEmpty ||
      p.contains("vec_id <"), "centroid-seed filter pushes to the scan")
  }

  test("margin mining: neighborhood means ride broadcasts; no quadratic " +
      "join beyond the bounded side pair (q181)") {
    val p = plan("q181_margin_mining")
    assert("BroadcastExchange".r.findAllIn(p).size >= 2,
      "norms and top-k means are side-sized — they must broadcast")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("gopher rules are a pure scan-side projection: no joins, no " +
      "aggregation (q185)") {
    val p = plan("q185_gopher_rules")
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      "every rule metric is row-local")
  }

  test("waterfall computes all stages in ONE aggregation pass (q186)") {
    val p = plan("q186_curation_waterfall")
    assert(!p.contains("CartesianProduct"))
    // every stage's counters come from ONE aggregation over the flag
    // frame (the bounded stack unpivots its single row) — never a
    // per-stage re-scan of the corpus
    assert(p.contains("Generate") || p.contains("stack"),
      "stage rows come from the stack unpivot")
    // the containment stage's gram frame is pinned in the plan cache —
    // its three consumers read cached (id, hash) rows, not re-derived text
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      "hashed grams must come from the plan cache")
  }

  test("CUSUM folds over the bucket rollup in the aggregate — no window " +
      "over raw events (q187)") {
    val p = plan("q187_cusum_changepoint")
    assert(!p.contains("Window"), "the scan state lives in the fold, not a window")
    assert(!p.contains("CartesianProduct"))
  }

  test("session sequences: one user-partitioned window, counts partial-" +
      "aggregate (q188)") {
    val p = plan("q188_session_sequences")
    assert(p.contains("Window"))
    assert(!p.toLowerCase.contains("no partition defined"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("triangles: ordered two-join enumeration, equi-joins only (q189)") {
    val p = plan("q189_triangles")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("containment join: candidates key on gram hashes, equi-joins only, " +
      "text never shuffles (q195)") {
    val p = plan("q195_containment_join")
    assert(p.contains("graft_shingle_hash"),
      "grams must be the fused native hash pass")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "prefix filtering must keep every join an equi-join")
    // the raw text column exists only below scan-side projections — no
    // Exchange in the plan may carry it
    val shuffled = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .exists(_.contains("text"))
    assert(!shuffled, "raw text must never cross a shuffle")
  }
}
