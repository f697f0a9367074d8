"""Snapshot the executed plans of the headline queries into PLANS.md —
reviewable plan-shape evidence (pushdown, broadcast, partial agg,
codegen spans) without running Spark. Regenerate after plan-affecting
changes:

  python tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402
from heroku_kafka_connect_spark.registry import all_queries  # noqa: E402
from heroku_kafka_connect_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: non-headline queries whose plan shape is itself the deliverable
#: (scale-pattern evidence beyond the bench set)
EXTRA = [
    "llm_contamination",   # broadcast eval side, pushed source filters
    "llm_sample_hash",     # zero-exchange narrow sampling predicate
    "llm_pack_sequences",  # exactly one window shuffle
    "rel_time_gapfill",    # agg + calendar explode + LOCF window, one key
    "rel_join_asof",       # union+window as-of (no inequality join)
    "avro_body_roundtrip", # ArrowEvalPython (never BatchEvalPython) serde
    "llm_split_train_eval",  # zero-exchange md5 split, pushes to scan
    "llm_length_buckets",  # one window exchange on the length band
    "text_tfidf",          # two token aggs + broadcast-N single row
    "llm_dedup_paragraph",  # block df-join shape (TF-IDF family)
    "llm_knn_recall",      # sampled exact side + bucketed LSH side
    "stream_static_enrich",  # fact side unshuffled through 2 dims
    "src_python_datasource",  # custom source: BatchScan over generator
    "llm_kmeans_train",    # iterative: k-centroid broadcast per Lloyd round
    "llm_dedup_semantic",  # (label, LSH-bucket)-blocked cosine pairs -> CC manifest
    "llm_dedup_semantic_centroid2",  # r13: 2-probe centroid blocking (top-2 vs
                           # final centroids, broadcast n x k pass)
    "llm_blocking_chooser",  # r13: corpus-shape chooser (Lloyd train + top-2
                           # silhouette + balance -> 1-row decision)
    "llm_dedup_incremental_semantic",  # r14: chooser-dispatched new x indexed
                           # semantic tier over the lexical classifier
    "llm_curation_incremental",  # r15: batch-scoped curation tail over the
                           # three-tier classifier + memoized index artifacts
    "rel_window_range_frame",  # value-bounded RANGE frame, one window shuffle
    "rel_variant_json",    # parse_json once, typed variant_get paths
    "rel_join_bucketed",   # co-bucketed SMJ: only exchange is the final agg
    "llm_pii_scrub",       # narrow map-only regex scrub, zero shuffle
    "llm_boilerplate_strip",  # block df-join + ordered per-doc reassembly
    "text_bm25_topk",      # filter-before-agg + 1-row stats broadcast + TopK
    "llm_curriculum_order",  # offset+local-rank global index, no global window
    "llm_perplexity_buckets",  # histogram prefix-sum deciles, no corpus NTILE
    "rel_zorder_index",    # narrow map-only bit interleave, zero shuffle
    "llm_bpe_train",       # 3 merge rounds on checkpointed vocab state
    "rel_event_funnel",    # user-keyed min-agg chain, co-partitioned joins
    "src_partition_pruning",  # PartitionFilters listing-time skip
    "llm_pq_search",       # ADC: codes scan + broadcast LUT join
    "llm_hard_negatives",  # broadcast anchors, label-mismatch fused in-scan
    "rel_data_skew_report",  # key agg + 1-row stats + TakeOrdered
    "rel_asof_nearest",    # bidirectional as-of in one window pass
    "llm_span_corruption",  # narrow hash-mask, shuffle only at reassembly
    "src_offset_gap_audit",  # bucketed lag, no single-partition corpus sort
    "udf_pandas_cosine_topk",  # ArrowEvalPython kernel + TakeOrdered
    "cdc_extract_diff",    # one co-partitioned full-outer join, |delta| emit
    "llm_matryoshka_recall",  # two broadcast-query corpus passes + tiny join
    "llm_embedding_outliers",  # (label,pos) agg + broadcast label moments
    "rel_numeric_histogram",  # agg-first; window runs on |buckets| rows
    # --- round 6 ---
    "llm_token_zipf",      # r6 fix: TakeOrderedAndProject top-1000, no vocab sort
    "llm_knn_ivf",         # r6 fix: zero-shuffle literal-array centroid argmax
    "rel_sessionize_gap",  # ONE user-key exchange for lag+ordinal+session agg
    "rel_cusum_changepoint",  # corpus -> |days| agg; windows on tiny series
    "llm_dp_contribution_cap",  # source-partitioned rank (WindowGroupLimit on keep-filter)
    "llm_policy_iou",      # shared token front -> two policies -> 1-row fold
    "text_tokenizer_fertility",  # regexp counts fused in scan, |langs| agg
    "mm_decode_meta",      # real PNG parse inside one narrow MapInPandas stage
    "llm_curation_pipeline",  # E2E curation DAG: dedup+quality+decontam+pack
    "udf_map_in_arrow",    # PythonMapInArrow stage — raw-Arrow Python tier
    "rel_lateral_topn",    # LATERAL decorrelated into join + per-group limit
    # --- round 7 ---
    "llm_hamming_rerank",  # codes-only bit_count prefilter, vectors joined
                           # back for top-32 candidates only
    "llm_unigram_tokenizer_em",  # piece-table broadcast chain, integer DP
    "rel_entity_match",    # FastSS deletion-variant equi-join, lev only on survivors
    "text_setjoin_prefix",  # r9: prefix-filtered exact set-sim join (rare-token blocks)
    "rel_interval_overlap", # r9: week-bucketized big-big interval overlap join
    "llm_nb_langid",        # r9: relational NB grid join, alphabet-bounded broadcasts
    "llm_dedup_apply_full", # r9: three-rung manifest (memoized inputs -> one CC + joins)
    "llm_pca_power",        # r9: 3-round power iteration, no driver matrix
    "llm_contamination_near",  # r9: one banding pass, eval x train buckets only
    "rel_ab_sequential_msprt",  # r9: corpus -> |days| series, tiny windows
    "mm_cdc_chunking",      # r9: array-expression CDC, md5 once per chunk
    "rel_triangle_count",   # r9: degree-oriented wedges, equi-join closing probe
    "rel_peak_concurrency", # r9: sweep-line +-1 events, key-partitioned prefix sum
    "rel_survival_km",     # two map-side per-user MIN aggs -> |durations| KM fold
    "rel_attribution_last_touch",  # ONE user-partitioned window, linear in events
    "rel_markov_transitions",  # user-partitioned lag; normalizer on the 25-row matrix
    # --- round 8 ---
    "rel_market_basket",   # basket-key self-join, tiny item counts broadcast
    "rel_ewma_daily",      # exploded-offset equi-join, integer weights
    "rel_bootstrap_ci",    # x32 literal explode, map-side replica sums
    "rel_cms_heavy_hitters",  # 256-cell sketch agg + TakeOrdered probes
    "rel_bloom_semijoin_audit",  # one bit-array agg broadcast to map-only probe
    "rel_decile_lift",     # histogram-decomposed decile cut, no corpus NTILE
    "rel_abc_pareto",      # digit-banded running sum (offset decomposition)
    "text_posting_lists",  # posexplode + df TakeOrdered + shard-key grouping
    "llm_mmr_select",      # corpus pays the top-8 cut; greedy rounds candidate-sized
    "llm_rocchio_expand",  # nano-int seed centroid; two broadcast scans
    "llm_bbit_minhash",    # shared LSH front half + packed-word bit_count
    "avro_ocf_roundtrip",  # binaryFile scan -> MapInPandas OCF decode
    "mm_image_ahash",      # narrow synth/decode/hash + signature groupBy
    "mm_tone_spectrum",    # narrow synth/decode/DFT-project, zero shuffle
    "llm_retrieval_ndcg",  # broadcast-query scan + label-count broadcast
    "rel_new_vs_returning",  # first-seen min-agg joined on the user key
    "llm_dedup_semantic_centroid",  # r12: Lloyd broadcast rounds + cid-hash pair join + two_star CC
    "llm_exact_substr_spans",  # r12: positional-gram join + diagonal-island window
    "llm_exact_substr_apply",  # r12: covered-pos anti-set + ordered reassembly
    "rel_pagerank_coparts",  # r12: edge self-join + per-round join/decimal-agg
]


def main() -> None:
    spark = get_spark("hkc-plans")
    qs = all_queries()
    out = [
        "# PLANS — executed physical plans of the headline + signature queries",
        "",
        f"Generated by `tools/dump_plans.py` at `{SF_DIR}`. The shapes are",
        "asserted mechanically in `tests/test_plans.py`; read SCALE.md",
        "for why each shape is the one that survives cluster scale-up.",
        "",
    ]
    names = HEADLINE + [n for n in EXTRA if n in qs]
    for name in names:
        plan = qs[name].fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        out += [f"## {name}", "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(names)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
