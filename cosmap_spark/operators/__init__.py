"""Relational & spatial operators built from native DataFrame primitives."""

from cosmap_spark.operators.classifier import (  # noqa: F401
    classifier_auc,
    hashed_features,
    score_documents,
    train_quality_classifier,
)
from cosmap_spark.operators.asof import (  # noqa: F401
    asof_join,
    asof_join_cogroup,
)
from cosmap_spark.operators.cone_search import (  # noqa: F401
    cone_search,
    crossmatch,
)
from cosmap_spark.operators.dedup import (  # noqa: F401
    contamination_hits,
    edit_distance_pairs,
    dedup_clusters,
    exact_dedup,
    hamming_pairs,
    incremental_minhash_dedup,
    leakage_safe_split,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    passage_dedup,
    substring_dedup,
    simhash_pairs,
    winnow_dup_pairs,
    winnow_fingerprints,
)
from cosmap_spark.operators.multimodal import (  # noqa: F401
    image_phash,
    phash_dup_pairs,
)
from cosmap_spark.operators.graph import (  # noqa: F401
    degrees,
    pagerank,
    pagerank_quantized,
    triangle_counts,
)
from cosmap_spark.operators.intervals import (  # noqa: F401
    coalesce_intervals,
    interval_overlap_join,
)
from cosmap_spark.operators.knn import (  # noqa: F401
    cluster_balanced_sample,
    knn_bruteforce,
    knn_ivf,
    knn_lsh,
    lsh_build,
    semantic_contamination,
    semantic_dedup_balance,
    semantic_dedup_pairs,
)
from cosmap_spark.operators.packing import (  # noqa: F401
    global_rank,
    ntile_from_rank,
    pack_bins,
    pack_offsets,
    row_index,
)
from cosmap_spark.operators.pq import (  # noqa: F401
    ivf_residuals,
    knn_ivfpq,
    opq_train,
    pq_adc_topk,
    pq_encode,
    pq_train,
    rotate_vectors,
)
from cosmap_spark.operators.report import (  # noqa: F401
    corpus_report,
    pair_metrics,
    plan_summary,
    skew_report,
    table_profile,
    threshold_sweep,
)
from cosmap_spark.operators.dsir import (  # noqa: F401
    dsir_sample,
    dsir_weights,
    hashed_ngram_features,
)
from cosmap_spark.operators.lm import (  # noqa: F401
    bigram_model,
    doc_nll,
    perplexity_filter,
)
from cosmap_spark.operators.robust import (  # noqa: F401
    robust_outliers,
    winsorize,
)
from cosmap_spark.operators.skew import (  # noqa: F401
    grouped_topk,
    replicated_broadcast_join,
    salted_agg,
)
from cosmap_spark.operators.sketch import (  # noqa: F401
    distinct_rollup,
    heavy_hitters_sketch,
    kmv_estimate,
    kmv_jaccard,
    kmv_leaf,
    kmv_rollup,
    merge_kmv_tables,
    kmv_union,
    merge_mg_tables,
    merge_sketch_tables,
    mg_summary,
    quantile_rollup,
    segment_overlap,
)
from cosmap_spark.operators.stats_tests import (  # noqa: F401
    chi2_test,
    decide,
    ks_test,
    mann_whitney_u,
    proportion_ztest,
    welch_ttest,
)
from cosmap_spark.operators.tseries import (  # noqa: F401
    changepoints_binseg,
    grouped_changepoint,
    grouped_trend,
    subsequence_search,
    subsequence_search_multi,
)
from cosmap_spark.operators.index_store import (  # noqa: F401
    ivf_append,
    lex_append,
    load_ann_index,
    load_lex_index,
    load_token_bags,
    pq_append,
    save_ann_index,
    save_lex_index,
    save_token_bags,
)
from cosmap_spark.operators.expectations import (  # noqa: F401
    enforce,
    quarantine,
    validate,
)
from cosmap_spark.operators.diff import (  # noqa: F401
    category_drift,
    corpus_diff,
    diff_summary,
    drift_bin_counts,
    drift_reference,
    heavy_hitter_categories,
    snapshot_drift,
)
from cosmap_spark.operators.funnel import (  # noqa: F401
    attribution,
    cohort_retention,
    event_paths,
    event_transitions,
    funnel,
    funnel_latency,
    funnel_sliding,
    funnel_summary,
    funnel_summary_levels,
)
from cosmap_spark.operators.vocab import (  # noqa: F401
    apply_bpe_merge,
    bpe_encode,
    bpe_pair_counts,
    token_vocab,
    train_bpe,
)
from cosmap_spark.operators.retrieval import (  # noqa: F401
    bm25_scored,
    bm25_search,
    bm25_search_weighted,
    bm25_weight,
    build_lex_index,
    inline_tf,
    maxsim_rerank,
    maxsim_rerank_plaid,
    maxsim_rerank_pruned,
    maxsim_token_quantizer,
    maxsim_topk,
    phrase_match,
    phrase_match_multi,
    phrase_search,
    retrieval_eval,
    rm3_expand,
    rrf_fuse,
    topk_cut,
)
from cosmap_spark.operators.sampler import (  # noqa: F401
    deterministic_sample,
    epoch_shuffle,
    equi_depth_bin,
    exact_k_per_group,
    exact_k_sample,
    group_kfold_assign,
    kfold_assign,
    negative_pairs,
    select_to_token_budget,
    stratified_sample,
    temperature_mixture,
    uniform_box_samples,
    uniform_sphere_samples,
    weighted_k_sample,
    weighted_sample,
)
from cosmap_spark.operators.merge import (  # noqa: F401
    latest_per_key,
    merge_upsert,
    mor_reconcile,
    scd2_apply,
    snapshot_cdc,
)
from cosmap_spark.operators.layout import (  # noqa: F401
    describe_layout,
    layout_spans,
    pruning_ratio,
    write_zordered,
    zorder_key,
)
