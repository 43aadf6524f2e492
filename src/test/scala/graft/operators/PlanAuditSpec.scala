package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funspec.AnyFunSpec

/** SURVEY §4's scale rules, asserted on the physical plans: filters and
  * projections reach the parquet scan, dimension joins broadcast, and the
  * hot paths stay inside whole-stage codegen.
  */
class PlanAuditSpec extends AnyFunSpec with SparkTestBase {

  private def explain(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** Count physical nodes by their formatted-explain detail header —
    * "(4) Exchange" — so tree + detail duplication doesn't double-count. */
  private def countNodes(plan: String, node: String): Int =
    plan.linesIterator.count(_.matches(s"^\\(\\d+\\) $node.*"))

  describe("predicate pushdown and column pruning") {

    it("q1 pushes the shipdate filter into the parquet scan") {
      val plan = explain(Relational.q1PricingSummary(spark, sfDir))
      assert(plan.contains("PushedFilters"), plan)
      assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*l_shipdate[^\\]]*\\].*"),
        "l_shipdate filter not pushed to scan")
    }

    it("q1 prunes the lineitem scan to the referenced columns only") {
      val plan = explain(Relational.q1PricingSummary(spark, sfDir))
      val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
      assert(readSchema.contains("l_quantity") && readSchema.contains("l_shipdate"))
      assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipmode"),
        s"unreferenced columns not pruned: $readSchema")
    }

    it("q3 broadcasts the customer dimension") {
      val plan = explain(Relational.q3TopUnshipped(spark, sfDir))
      assert(plan.contains("BroadcastHashJoin"), plan)
    }

    it("q5's star join broadcasts every dimension (a single fact shuffle path)") {
      val plan = explain(Relational.q5LocalVolume(spark, sfDir))
      val broadcasts = countNodes(plan, "BroadcastHashJoin")
      assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts")
      assert(countNodes(plan, "SortMergeJoin") == 0,
        "star-schema dims must not sort-merge")
    }

    it("q1 runs inside whole-stage codegen") {
      // AQE only materializes codegen annotations once stages execute
      val df = Relational.q1PricingSummary(spark, sfDir)
      df.collect()
      assert(explain(df).contains("codegen id"))
    }

    it("text quality scoring stays a single stage (projection only, no shuffle)") {
      val df = TextAnalysis.qTextQuality(spark, sfDir)
      val shuffles = countNodes(explain(df), "Exchange")
      // one exchange allowed for the final orderBy; nothing else may shuffle
      assert(shuffles <= 1, s"projection query shuffled $shuffles times")
    }

    it("pii redaction and multimodal meta stay scan-side projections (<=1 exchange, the sort)") {
      val pii = explain(Privacy.qPiiRedact(spark, sfDir))
      assert(countNodes(pii, "Exchange") <= 1, s"pii redaction shuffled:\n$pii")
      val mm = explain(Multimodal.qMultimodalMeta(spark, sfDir))
      assert(countNodes(mm, "Exchange") <= 1, s"multimodal meta shuffled:\n$mm")
    }

    it("tf-idf shuffles aggregated frames only and AQE broadcasts the df join") {
      // tf hash-agg (map-side partial first), df groupBy (term), the
      // df join-back, doc window, output sort — each over the aggregated
      // (term, doc) frame, never the raw token stream. The df join costs
      // one static exchange more than the old term-partitioned window,
      // but that window was the r5 scale-killer (a stopword's whole
      // posting stream in one task); the join key is AQE-skew-splittable.
      val df = TextAnalysis.qTfidfTop(spark, sfDir)
      assert(countNodes(explain(df), "Exchange") <= 5,
        s"tf-idf over-shuffled:\n${explain(df)}")
      // at runtime the vocabulary-sized (term, df) frame broadcasts
      df.collect()
      assert(explain(df).contains("BroadcastHashJoin"),
        s"df join-back did not broadcast under AQE:\n${explain(df)}")
    }

    it("the r6 text family stays projection-shaped (bounded exchanges)") {
      // BPE apply: per-doc positional transforms + one lang aggregate —
      // 2 exchanges (partial->final agg, output sort), nothing else
      val bpe = explain(TextAnalysis.qTokenizeBpe(spark, sfDir))
      assert(countNodes(bpe, "Exchange") <= 2, s"BPE apply over-shuffled:\n$bpe")
      // winnow fingerprints: pure projection + output sort
      val win = explain(TextAnalysis.qTextWinnow(spark, sfDir))
      assert(countNodes(win, "Exchange") <= 1, s"winnow shuffled:\n$win")
      assert(countNodes(win, "Window") == 0, "winnow must not use window functions")
    }

    it("q_events_anomaly never shuffles the event stream (stats broadcast back)") {
      val df = EventOps.qEventsAnomaly(spark, sfDir)
      df.collect()
      val plan = explain(df)
      assert(plan.contains("BroadcastHashJoin"), s"stats did not broadcast:\n$plan")
    }

    it("the second-session family prunes scans to referenced columns") {
      def readSchemas(df: org.apache.spark.sql.DataFrame): String =
        explain(df).linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
      // RANGE window touches 4 of orders' 6 columns
      val wr = readSchemas(Relational.qWindowRange(spark, sfDir))
      assert(!wr.contains("o_orderstatus") && !wr.contains("o_orderpriority"), wr)
      // CDC merge needs only the key and the price
      val mu = readSchemas(Warehouse.qMergeUpsert(spark, sfDir))
      assert(!mu.contains("o_orderdate") && !mu.contains("o_custkey"), mu)
      // Q21 shape reads 3 of lineitem's 11 columns
      val ls = readSchemas(Relational.qLateSoleSupplier(spark, sfDir))
      assert(!ls.contains("l_extendedprice") && !ls.contains("l_quantity"), ls)
      // segment dedup reads only (doc_id, text) from documents
      val sd = readSchemas(Dedup.qSegmentDedup(spark, sfDir))
      assert(!sd.contains("lang") && !sd.contains("source") && !sd.contains("n_chars"), sd)
    }

    it("the round-7 stats family shuffles only aggregated frames") {
      // HHI uses the sum-of-squares identity: NO window node at all
      val hhi = explain(Stats.qHhi(spark, sfDir))
      assert(countNodes(hhi, "Window") == 0, s"hhi must be windowless:\n$hhi")
      // histogram/benford/gini: one fact aggregate + windows over the
      // bounded bucket/digit frame — exchange count stays small and the
      // window inputs are post-aggregate (single-partition by design)
      for ((name, df) <- Seq(
          "q_histogram" -> Stats.qHistogram(spark, sfDir),
          "q_benford" -> Stats.qBenford(spark, sfDir),
          "q_gini_binned" -> Stats.qGiniBinned(spark, sfDir))) {
        val plan = explain(df)
        assert(countNodes(plan, "Exchange") <= 4, s"$name over-shuffled:\n$plan")
      }
      // mad outliers: the event stream itself never shuffles — stats
      // broadcast back onto the probe scans
      val mad = EventOps.qEventsAnomaly(spark, sfDir)
      mad.collect()
      assert(explain(mad).contains("BroadcastHashJoin"))
    }

    it("q_profit_by_nation_year broadcasts every dimension (Q9 star shape)") {
      val plan = explain(Relational.qProfitByNationYear(spark, sfDir))
      assert(countNodes(plan, "BroadcastHashJoin") >= 3,
        s"part/supplier/nation must broadcast:\n$plan")
      // the name predicate is applied before the join (dim-side filter),
      // so the fact probes an already-filtered hash set
      assert(plan.contains("p_name"), plan)
    }

    it("no query plans a cartesian product or an unbounded nested-loop join") {
      // the O(n²) killers at 100 TB: every candidate-pair generator must
      // ride an equality join. Skip the entries that run side-effecting
      // writes at plan-build time. Bounded broadcast nested loops are
      // legitimate where the broadcast side is tiny BY CONSTRUCTION:
      // q_knn_brute/q_knn_ivf broadcast a 1-row query vector / #cells-row
      // centroid table; q_knn_recall broadcasts the RECALL_QS-row sample
      // and the IVF_K-row trained centroids.
      val skip = Set("q_lineage_selfcheck", "q_source_csv", "q_source_json",
        "q_source_orc")
      // q_zorder_layout broadcasts a 1-row domain-stats frame;
      // q_supplier_share broadcasts a 1-row global-mean frame;
      // q_heavy_hitters broadcasts the 1-row count-min sketch
      // q_knn_pq broadcasts the 1-row query vector and the M*KSUB LUT;
      // q_text_collocations broadcasts the 1-row bigram total
      // q_corpus_drift broadcasts the 1-row global-quantile frame
      // q_theta_sets crossJoins two 1-row sketch frames;
      // q_split_leakage crossJoins two 1-row summary frames;
      // q_data_quality crossJoins the 1-row metric frame with the 1-row
      // referential-orphan count
      val boundedBroadcast = Set("q_knn_brute", "q_knn_ivf", "q_knn_recall",
        "q_zorder_layout", "q_supplier_share", "q_heavy_hitters", "q_knn_pq",
        "q_text_collocations", "q_corpus_drift", "q_theta_sets",
        "q_split_leakage", "q_knn_ivfpq", "q_data_quality",
        // q_embedding_jl broadcasts the RECALL_QS-row query sample;
        // q_bm25 broadcasts the 1-row corpus stats frame;
        // q_embedding_probe broadcasts the 1-row trained-weight frame;
        // q_idle_capital broadcasts the 1-row global-mean frame;
        // q_bpe_train broadcasts the 1-row per-round argmax pair;
        // q_pagerank broadcasts the 1-row node-count frame;
        // q_join_size_est crossJoins three 1-row sketch/count frames
        // q_skew_report crossJoins the 1-row stats and top-10 frames
        "q_embedding_jl", "q_bm25", "q_embedding_probe", "q_idle_capital",
        "q_bpe_train", "q_pagerank", "q_join_size_est", "q_skew_report",
        // q_graph_triangles crossJoins the 1-row mean-volume and
        // triangle-count frames onto ≤|nations|²-row aggregated frames
        "q_graph_triangles",
        // q_k_anonymity crossJoins two 1-row per-level stat frames
        "q_k_anonymity",
        // q_dedup_semantic broadcasts the IVF_K-row trained centroids
        // (same bounded shape as q_knn_ivf); q_semdedup_sweep rides the
        // same quantizer plus a 1-row corpus-count crossJoin — its tau
        // replay is an explode, not a join
        "q_dedup_semantic", "q_semdedup_sweep",
        // q_kmeans_profile broadcasts the IVF_K-row trained centroids
        // (assignCells) and crossJoins the 1-row total frame;
        // q_embedding_pca crossJoins only 1-row frames (per-dim stats,
        // the DIM x DIM matrix row, the weight vector)
        "q_kmeans_profile", "q_embedding_pca",
        // q_knn_nprobe crossJoins the RECALL_QS-row query sample for its
        // one brute truth pass (q_knn_recall's documented shape); the
        // probe replay itself is an explode, not a join
        "q_knn_nprobe",
        // q_target_encode crossJoins the 1-row global-mean frame
        "q_target_encode",
        // q_auc_probe broadcasts the 1-row trained-weight frame;
        // q_assoc_rules crossJoins the 1-row basket-count frame;
        // q_hard_negatives broadcasts the IVF_K-row trained centroids
        "q_auc_probe", "q_assoc_rules", "q_hard_negatives",
        // q_calibration broadcasts the 1-row trained-weight frame;
        // q_mmr_rerank and q_rrf_fusion broadcast the 1-row query
        // vector (q_knn_brute's shape) and 1-row BM25 corpus stats
        "q_calibration", "q_mmr_rerank", "q_rrf_fusion",
        // q_knn_outlier broadcasts the IVF_K-row trained centroids;
        // q_group_kfold crossJoins the 1-row revenue-total frame
        "q_knn_outlier", "q_group_kfold",
        // q_erasure_audit crossJoins three 1-row count frames;
        // q_link_predict broadcasts the 1-row mean-weight frame
        // (q_graph_triangles' shape)
        "q_erasure_audit", "q_link_predict",
        // q_label_noise broadcasts the 1-row trained-weight frame;
        // q_quality_probe broadcasts the 1-row trained-weight frame
        // for both the per-step gradient and the scoring projection
        // (q_auc_probe's shape over text features)
        "q_label_noise", "q_quality_probe",
        // q_order_gaps / q_curriculum (ntileExact): two 1-row frames
        // crossJoin onto the checkpointed source snapshot — range stats
        // (referenced by both the histogram and boundary-rank branches)
        // and the collapsed boundary-keys row
        "q_order_gaps", "q_curriculum",
        // q_rfm: three chained ntileExact calls (same two 1-row frames
        // per call as q_order_gaps) plus the 1-row max-order-date frame;
        // q_user_lifecycle crossJoins the 1-row last-active-day frame
        "q_rfm", "q_user_lifecycle",
        // q_js_divergence crossJoins the broadcast (top-V + OOV)-row
        // term frame (<=33 rows by construction) onto the per-source
        // totals; q_t_closeness crossJoins the broadcast k-row global
        // priority distribution onto the QI-group frame
        "q_js_divergence", "q_t_closeness",
        // q_chi2_terms crossJoins the 1-row grand-total frame;
        // q_psi crossJoins the 1-row decile-boundary frame and the
        // broadcast 10-row global-bin-share frame (jsDivergence's shape)
        "q_chi2_terms", "q_psi",
        // q_woe_iv crossJoins the 1-row event/non-event totals frame;
        // q_graph_modularity crossJoins the 1-row node-count frame
        // (q_pagerank's shape)
        "q_woe_iv", "q_graph_modularity",
        // q_uncertainty_sample broadcasts the 1-row trained-weight frame
        // (q_embedding_probe's shape); q_embedding_sq broadcasts the
        // 1-row per-dim min/max array frame
        "q_uncertainty_sample", "q_embedding_sq",
        // q_hits crossJoins the 1-row per-round max-normalizer frames;
        // q_bootstrap_ci crossJoins the 1-row point-estimate frame
        // q_ab_welch crossJoins the two 1-row arm-moment frames;
        // q_cuped crossJoins the two 1-row arm frames + 1-row globals
        // q_survival_km crossJoins the 1-row horizon-date frame;
        // q_gains_curve: ntileExact's two 1-row frames + 1-row weights
        "q_hits", "q_bootstrap_ci", "q_ab_welch", "q_cuped", "q_survival_km",
        // q_forecast_backtest crossJoins the 1-row max-month and fit frames
        "q_gains_curve", "q_forecast_backtest",
        // q_value_share / q_neg_sampling crossJoin a 1-row grand-total
        // frame computed from the ALREADY-REDUCED per-key frame;
        // q_lapsed_balance crossJoins the 1-row positive-balance
        // threshold frame (q_target_encode's shape)
        "q_value_share", "q_neg_sampling", "q_lapsed_balance",
        // q_mix_shift crossJoins the 1-row year-totals frame computed
        // from the enum-sized (segment, year) aggregate; q_theil
        // crossJoins the 1-row corpus-totals frame over the
        // nation-sized per-group frame
        "q_mix_shift", "q_theil",
        // q_silhouette broadcasts the IVF_K-row trained centroids
        // (q_dedup_semantic's shape)
        "q_silhouette",
        // q_srm_check crossJoins two 1-row frames (split total, chi2
        // total) over the enum-sized split-count frame
        "q_srm_check",
        // q_mannwhitney crossJoins two 1-row frames (the 2-group
        // rank-sum pivot and the tie-correction totals)
        "q_mannwhitney",
        // q_kendall theta-self-joins the contingency frame — bounded BY
        // CONSTRUCTION (|quantity grid| x |discount grid| cells) — and
        // crossJoins four 1-row moment frames
        "q_kendall",
        // q_perm_test broadcasts the 1-row observed-rate frame onto the
        // replicate fan-out and crossJoins the 1-row observed-diff frame
        "q_perm_test",
        // q_heaps_fit crossJoins the 1-row max-doc-id frame (bucket
        // assignment, referenced by both branches) and the 1-row OLS
        // beta frame onto the HEAPS_BUCKETS-row prefix frame
        "q_heaps_fit",
        // q_ipw_effect broadcasts the 1-row trained-weight frame
        // (q_auc_probe's shape) for scoring and inside probe training
        "q_ipw_effect",
        // q_local_clustering crossJoins the 1-row mean-weight frame
        // (q_graph_triangles' shape) onto the nation-bounded pair frame
        "q_local_clustering",
        // q_hurst crossJoins the 1-row OLS fit frame onto the
        // ≤|HURST_MS|-row block-size frame
        "q_hurst",
        // q_effective_rank crossJoins only 1-row frames (per-dim stats,
        // the DIM x DIM matrix row — q_embedding_pca's shape)
        "q_effective_rank",
        // q_did broadcasts the 1-row range-midpoint stats frame onto the
        // event stream (the bm25-stats shape)
        "q_did",
        // q_periodogram crossJoins the 1-row best-R2 frame onto the
        // |PGRAM_PERIODS|-row probe frame
        "q_periodogram",
        // q_ndcg crossJoins only 1-row frames (DCG, IDCG, n_matching)
        "q_ndcg")
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (!skip(name)) {
          val plan = explain(fn(spark, sfDir))
          assert(countNodes(plan, "CartesianProduct") == 0, s"$name plans a cartesian product")
          if (!boundedBroadcast(name))
            assert(countNodes(plan, "BroadcastNestedLoopJoin") == 0,
              s"$name plans a nested-loop join")
        }
      }
    }

    it("no query plans an unpartitioned window over a data-proportional frame") {
      // A window with an empty partition spec drags its WHOLE input into
      // one task for the sort — the single-task killer at 100 TB. It is
      // only acceptable over frames bounded BY CONSTRUCTION (a constant
      // bucket count, a GROUP BY over an enum-sized key), never over
      // anything that grows with the data. The whitelist below names the
      // queries whose plans carry such a bounded global window and what
      // bounds each one; everything else must plan ZERO of them.
      val skip = Set("q_lineage_selfcheck", "q_source_csv", "q_source_json",
        "q_source_orc")
      val boundedGlobalWindow: Map[String, String] = Map(
        "q_auc_probe" -> ("aucOf's bucket-cumulative window: <=256 rows by " +
          "the constant bucket count, whatever the corpus size"),
        "q_order_gaps" -> ("ntileExact's bucket-cumulative window: " +
          "<=PCT_BUCKETS rows by construction"),
        "q_autocorr" -> ("lag/mean over the per-DAY aggregate — " +
          "calendar-span-bounded, not row-bounded"),
        "q_benford" -> "total over the 9-row leading-digit frame",
        "q_corpus_mixture" -> "total over the (lang x source) enum frame",
        "q_cramers_v" -> ("contingency-cell frame: |returnflag| x " +
          "|linestatus| rows"),
        "q_gini_binned" -> "cumulative shares over the constant bucket frame",
        "q_histogram" -> "cumulative counts over the constant bucket frame",
        "q_kcore" -> ("lag over the per-peel-round census — rounds <= max " +
          "core number, not data size"),
        "q_ks_test" -> "two CDFs over the constant bucket frame",
        "q_wasserstein" -> ("integer CDF-gap sums over the constant " +
          "bucket frame (q_ks_test's shape)"),
        "q_mutual_info" -> "total over the contingency-cell frame",
        "q_rrf_fusion" -> ("row_number AFTER .limit(RRF_N): both ranked " +
          "frames are <=RRF_N rows"),
        "q_sample_balanced" -> "min over the per-CLASS count frame",
        "q_sample_temperature" -> "share totals over the per-SOURCE frame",
        "q_curriculum" -> ("ntileExact's bucket-cumulative window: " +
          "<=PCT_BUCKETS rows by construction"),
        "q_rfm" -> ("ntileExact's bucket-cumulative windows (three chained " +
          "calls): <=PCT_BUCKETS rows each by construction"),
        "q_js_divergence" -> ("global-total window over the aggregated " +
          "(top-V + OOV) term frame: <=JS_V+1 rows by construction"),
        "q_zipf_fit" -> ("rank row_number over the TakeOrdered head: " +
          "<=ZIPF_N rows by construction"),
        "q_quality_sweep" -> ("suffix cumsum + totals over the completed " +
          "10-row threshold grid"),
        "q_t_closeness" -> ("global distribution cum/total windows over " +
          "the k-category priority frame (k=|orderpriority| enum)"),
        "q_psi" -> ("percentilesTwoPhase bucket-cumulative windows (the " +
          "constant 'ALL' group folds to an empty partition spec): " +
          "<=PCT_BUCKETS rows each by construction"),
        "q_survival_km" -> ("risk-table cum/total windows over the " +
          "per-duration frame: <=|calendar months| rows by construction"),
        "q_gains_curve" -> ("ntileExact bucket windows (<=PCT_BUCKETS rows) " +
          "+ cum/total windows over the 10-row decile frame"),
        "q_stl_decompose" -> ("centered-MA window over the per-DAY " +
          "aggregate — calendar-span-bounded (q_autocorr's shape)"),
        "q_stl_strength" -> ("centered-MA window over the per-DAY " +
          "aggregate — calendar-span-bounded (q_stl_decompose's shape)"),
        "q_heaps_fit" -> ("cumulative windows over the HEAPS_BUCKETS-row " +
          "prefix frame: constant-bounded by construction"),
        "q_hurst" -> ("day-rank row_number over the per-DAY aggregate — " +
          "calendar-span-bounded (q_autocorr's shape)"),
        "q_ar_fit" -> ("lag/mean windows over the per-DAY aggregate — " +
          "calendar-span-bounded (q_autocorr's shape, same moments)"),
        "q_changepoint_split" -> ("prefix-sum/total windows over the " +
          "per-DAY aggregate — calendar-span-bounded (q_autocorr's shape)"),
        "q_ndcg" -> ("position row_number over the LIMIT-10 top frame and " +
          "the LIMIT-10 ideal frame: <=NDCG_K rows by construction " +
          "(q_zipf_fit's shape)"))
      val violations = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) if !skip(name) && !boundedGlobalWindow.contains(name) =>
          val plan = fn(spark, sfDir).queryExecution.sparkPlan
          val globals = plan.collect {
            case w: org.apache.spark.sql.execution.window.WindowExec
                if w.partitionSpec.isEmpty => w
          }
          if (globals.isEmpty) Nil
          else Seq(s"$name: ${globals.size} unpartitioned window(s) — " +
            globals.map(_.windowExpression.map(_.sql).mkString(", ")).mkString(" | "))
        case _ => Nil
      }
      assert(violations.isEmpty, violations.mkString("\n"))
    }

    it("no query ranks via a window partitioned only by constant-cardinality keys") {
      // The r10 escape hatch from the ban above: a window partitioned by
      // a CONSTANT-cardinality key (the RECALL_QS sampled query ids, a
      // probe-width enum) is "partitioned", yet each of its ~10
      // partitions is corpus-proportional and sorts in one task — same
      // single-task killer, different disguise. Cardinality is invisible
      // in a static plan, so the heuristic bans windows whose partition
      // keys all come from the known constant-key names the gauges group
      // on; rankings over those keys must run through the O(k)
      // map-side-combinable MinKPair aggregates (Similarity.topKByGroup)
      // instead. A window here is only acceptable when its INPUT frame
      // is bounded by construction — whitelist with the bound.
      val constantKeys = Set("qid", "nprobe", "method", "tau", "dow", "band")
      val boundedInput: Map[String, String] = Map.empty
      val violations = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) if !boundedInput.contains(name) =>
          val plan = fn(spark, sfDir).queryExecution.sparkPlan
          val hits = plan.collect {
            case w: org.apache.spark.sql.execution.window.WindowExec
                if w.partitionSpec.nonEmpty && w.partitionSpec.forall {
                  case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
                    constantKeys.contains(a.name)
                  case _ => false
                } => w.partitionSpec.map(_.sql).mkString(",")
          }
          if (hits.isEmpty) Nil
          else Seq(s"$name: window(s) partitioned by constant-cardinality " +
            s"key(s) ${hits.mkString(" | ")}")
        case _ => Nil
      }
      assert(violations.isEmpty, violations.mkString("\n"))
    }

    it("q_ngram_novelty keeps the split materialized and the hash out of the lambda") {
      // the r9 perf lesson: an inline split(text) inside the trigram HOF
      // lambda re-splits the document per element_at reference
      // (interpreted lambdas get no CSE) and the inferred Generate
      // filter inlines the whole expression again — O(len²)/doc, a 4-10×
      // slowdown. Pin the fixed shape: split(text) appears ONCE per
      // branch (the words projection), and md5 hashing runs post-explode
      // (never inside a lambdafunction).
      val plan = TextAnalysis.qNgramNovelty(spark, sfDir)
        .queryExecution.optimizedPlan.toString
      val splits = "split\\(text".r.findAllIn(plan).size
      assert(splits <= 2, s"split(text) inlined $splits times (2 branches expected):\n$plan")
      assert(!plan.matches("(?s).*lambdafunction\\([^)]*md5.*"),
        "hash must run post-explode, not inside the interpreted lambda")
    }

    it("q_dedup_substring keeps the hot path lambda-free (position explode + codegen window build)") {
      // the second-session lesson, one level past q_ngram_novelty's: an
      // ALIASED window array let the inferred Generate filter be
      // substituted through both projections to the scan, re-splitting
      // text per slice reference — O(W²)/doc, 4.6 s vs 1.0 s at sf0.1.
      // The fixed shape explodes only the position SEQUENCE (the
      // inferred filter re-evaluates ints) and builds window+hash
      // post-explode in codegen. Pin: no interpreted lambda anywhere in
      // the plan, and no string work inside the Generate's filter.
      val plan = Dedup.qDedupSubstring(spark, sfDir)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("lambdafunction"),
        s"interpreted lambda re-entered the substring hot path:\n$plan")
      assert(plan.contains("explode(sequence(1"),
        s"the generator must explode the position sequence, not a window array:\n$plan")
      // the pushed size-guards may re-split per doc (int-only, O(W)) but
      // the WINDOW build (slice+concat) must appear exactly once per
      // cached-branch printout — never inside a Filter
      assert(!"Filter [^\\n]*concat_ws".r.findFirstIn(plan).isDefined,
        s"window string build leaked into a filter:\n$plan")
    }

    it("q_media_phash computes the dHash once behind a barrier, never in a lambda") {
      // the aliased dh was CollapseProject-inlined into all 4 band
      // expressions + the Generate filter, multiplying the interpreted
      // fold ~8×/doc (6.8 s → 1.1 s once static + cached). Pin: the
      // static expression tree (zero lambdafunctions) and the cache
      // barrier (InMemoryRelation) between the hash and its consumers.
      val df = Multimodal.qMediaPhash(spark, sfDir)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("lambdafunction"),
        s"the dHash must stay a static codegen tree:\n$plan")
      assert(plan.contains("InMemoryRelation"),
        "the hash frame's cache barrier is gone — dh will be re-inlined")
      // the substr-heavy hash expression must appear only below the
      // barrier, never in the band/verify consumers above it
      val aboveBarrier = plan.split("InMemoryRelation").head
      assert(!aboveBarrier.contains("ascii(substr"),
        s"dHash re-inlined above the cache barrier:\n$aboveBarrier")
    }

    it("the session-5 family keeps its scale shapes") {
      // Q6: ALL three range predicates reach the parquet scan
      val rd = explain(Relational.qRevenueDelta(spark, sfDir))
      assert(rd.matches("(?s).*PushedFilters: \\[[^\\]]*l_shipdate[^\\]]*\\].*"), rd)
      assert(rd.matches("(?s).*PushedFilters: \\[[^\\]]*l_discount[^\\]]*\\].*"), rd)
      assert(rd.matches("(?s).*PushedFilters: \\[[^\\]]*l_quantity[^\\]]*\\].*"), rd)
      // Q10: lineitem pre-aggregates per order BEFORE the orders join —
      // some join node must carry an l_orderkey-grouped aggregate in a
      // child subtree
      val rcPlan = Relational.qReturnedCustomers(spark, sfDir)
        .queryExecution.sparkPlan
      val joins = rcPlan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      val preAggBelowJoin = joins.exists(_.children.exists(_.collect {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
            if a.groupingExpressions.exists(_.references.exists(
              _.name == "l_orderkey")) => a
      }.nonEmpty))
      assert(preAggBelowJoin, "lineitem must pre-aggregate per order below the join")
      assert(countNodes(explain(Relational.qReturnedCustomers(spark, sfDir)),
        "BroadcastHashJoin") >= 2, "customer and nation must broadcast")
      // rank statistics: no window anywhere — ranking runs through the
      // range-partitioned two-pass Ranks.avgRank2, never a sort window
      for ((name, df) <- Seq(
          "q_mannwhitney" -> Stats.qMannWhitney(spark, sfDir),
          "q_spearman" -> Stats.qSpearman(spark, sfDir))) {
        assert(countNodes(explain(df), "Window") == 0,
          s"$name must rank without window functions")
      }
      // readability: pure projection into one enum aggregate — at most
      // the agg exchange plus the output sort
      val rb = explain(TextAnalysis.qReadability(spark, sfDir))
      assert(countNodes(rb, "Exchange") <= 2, s"readability over-shuffled:\n$rb")
    }

    it("no query forces a broadcast hint onto a vertex/frontier-keyed frame") {
      // The lesson the engine paid for twice (pagerank r11, closeness
      // r12): a frame keyed by a graph vertex / frontier id is unbounded
      // in graph size — on a billion-vertex graph a FORCED broadcast of
      // it is a driver collect + OOM. Such joins must stay unhinted so
      // AQE broadcasts them while small and shuffle-joins them at scale.
      // The ban: no ResolvedHint(BROADCAST) child may expose a
      // vertex-id-named output column. 1-row normalizer frames ("n",
      // "hmax") and dim broadcasts keep their hints — their outputs
      // don't carry vertex keys.
      val vertexKeys = Set("v", "node", "cnode", "snode", "frontier")
      val skip = Set("q_lineage_selfcheck", "q_source_csv", "q_source_json",
        "q_source_orc")
      val violations = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) if !skip(name) =>
          val analyzed = fn(spark, sfDir).queryExecution.analyzed
          analyzed.collect {
            case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
                if h.hints.strategy.exists(
                  _ == org.apache.spark.sql.catalyst.plans.logical.BROADCAST) =>
              h.child.output.map(_.name).filter(vertexKeys)
          }.flatten.distinct match {
            case Nil  => Nil
            case keys => Seq(s"$name: broadcast hint on vertex-keyed frame " +
              s"(columns ${keys.mkString(", ")})")
          }
        case _ => Nil
      }
      assert(violations.isEmpty, violations.mkString("\n"))
    }

    it("q_order_gaps derives quartiles without replaying the fact pipeline") {
      // ntileExact localCheckpoints the per-customer aggregate before its
      // 4-way fan-out (stats / histogram / boundary rank / assignment):
      // the orders scan + lag window + groupBy run ONCE, eagerly, and the
      // final plan reads only the checkpointed |customers|-row RDD — zero
      // file scans means zero fact replays.
      val plan = Relational.qOrderGaps(spark, sfDir).queryExecution.sparkPlan
      val fileScans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(fileScans.isEmpty,
        s"fact pipeline replayed: ${fileScans.size} file scans in the final plan")
    }
  }
}
