from .registry import REGISTRY, QuerySpec  # noqa: F401
from . import extensions  # noqa: F401  (registers extension queries)

# The external correctness driver oracle-checks only the FIRST 50
# registry entries (round-1 finding). Dict order therefore IS the
# driver-visibility order.
#
# Round-7 rotation (per VERDICT r6 item 2 — finish the ledger): a
# green r7 run gives EVERY entry registered before this window froze
# >= 1 driver-green row across CORRECTNESS_r01-r07 (the verdict's
# cross-round ledger, recomputed this round from the artifact union):
#   - 8 core sentinels (unchanged — the cross-cutting regression trip
#     wires: dedup-count, decimal money, the 3-way join, the windowed
#     alert, scored search, both sessionization variants, banded
#     ratios);
#   - ALL 30 entries with NO driver-green row: the 3 r06 hash-reds,
#     fixed this round (ext_length_buckets / ext_salted_hot_key_agg /
#     ext_salted_skew_join — bare sum(BIGINT) typed HUGEINT by DuckDB,
#     rendered float64 by the driver's canonicalizer; now CAST to
#     BIGINT, and test_no_oracle_emits_decimal_or_hugeint_columns bans
#     the class), the 23 wave-3..6 entries registered after the r06
#     window froze (q37_cohort_retention, the winnowing/MOSS family,
#     Gopher-funnel/classifier, zipf/divergence/overlap-matrix,
#     unimax/curriculum, oov-sweep/embedding-health/quality-
#     calibration/wilson/rare-token/ngram-novelty, normalization-dedup/
#     source-dedup-report, cluster-capped sample, knn label prop,
#     dedup threshold sweep), and the 3 NEW r7 entries
#     (q38_realtime_hours_envelope — VERDICT item 4, the last
#     uncovered Java post-processing path; ext_multimodal_decode_
#     pipeline — VERDICT item 5, the decode->resize->frame-sample
#     composition; ext_scd2_asof_enrichment — the SCD2 point-in-time
#     lookup composition; ext_feature_rerank — the real LTR-shaped
#     scorer in the reranker slot; 30 never-green seats total) — all
#     oracle-green in pytest at both SFs before seating;
#   - the first 12 (name order, deterministic) of the 30 entries whose
#     latest driver-green row is r4 — the remaining 18
#     (q24_corpus_cube..q9_keyword_search) are the r8 rotation queue
#     together with any entries registered after this window froze.
# Every entry outside the window stays oracle-paired and is verified
# by tests/test_oracle_queries.py at sf0.001 AND sf0.01 on every
# pytest run, so nothing is unchecked — the cap only decides who gets
# a driver CORRECTNESS row this round.
_CORE_SENTINELS = [
    "q1_dau_total",
    "q3_gmv_total",
    "q5_sale_detail_join",
    "q6_alert_window",
    "q9b_scored_search",
    "q10_banded_ratios",
    "q20_sessionization",
    "q36_native_session_window",
]

_NEVER_DRIVER_CHECKED = [
    # r06 hash-reds, HUGEINT oracle typing fixed this round
    "ext_length_buckets",
    "ext_salted_hot_key_agg",
    "ext_salted_skew_join",
    # registered after the r06 window froze (waves 3-6)
    "q37_cohort_retention",
    "ext_cluster_capped_sample",
    "ext_curation_funnel",
    "ext_curriculum_schedule",
    "ext_dedup_threshold_sweep",
    "ext_embedding_health",
    "ext_hashed_classifier",
    "ext_knn_label_prop",
    "ext_ngram_novelty",
    "ext_normalization_dedup",
    "ext_oov_sweep",
    "ext_overlap_span_locator",
    "ext_quality_calibration",
    "ext_rare_token_docs",
    "ext_source_dedup_report",
    "ext_source_divergence",
    "ext_source_overlap_matrix",
    "ext_unimax_mix",
    "ext_wilson_source_rank",
    "ext_winnowing_fingerprints",
    "ext_winnowing_indexed",
    "ext_winnowing_overlap_pairs",
    "ext_zipf_slope",
    # new this round (r7)
    "q38_realtime_hours_envelope",
    "ext_multimodal_decode_pipeline",
    "ext_scd2_asof_enrichment",
    "ext_feature_rerank",
]

_STALEST = [
    # latest driver-green row is r4 (first 13 in name order; the
    # remaining 17 — q25_funnel_daily..q9_keyword_search — rotate
    # in r8)
    "q11_pagination",
    "q12_alert_dedup_keys",
    "q13_props_map_agg",
    "q14_star_join_rollup",
    "q15_rollup_hourly",
    "q16_brand_revenue",
    "q17_asof_prev_order",
    "q18_running_gmv",
    "q19_semi_anti_segments",
    "q21_set_ops",
    "q22_pivot_hourly_types",
    "q23_balance_deciles",
]

_DRIVER_WINDOW = _CORE_SENTINELS + _NEVER_DRIVER_CHECKED + _STALEST

_DRIVER_CAP = 50


def _reorder() -> None:
    # Hard errors, not asserts: these import-time integrity checks must
    # survive python -O (a mis-ordered or short registry would silently
    # change what the driver verifies).
    if len(_DRIVER_WINDOW) != _DRIVER_CAP:
        raise RuntimeError(
            f"driver window is {len(_DRIVER_WINDOW)} entries, want exactly {_DRIVER_CAP}"
        )
    if len(set(_DRIVER_WINDOW)) != _DRIVER_CAP:
        raise RuntimeError("driver window contains duplicates")
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"driver window names not in registry: {missing}")
    rest_core = [
        n for n in REGISTRY if not n.startswith("ext_") and n not in _DRIVER_WINDOW
    ]
    rest_ext = [
        n for n in REGISTRY if n.startswith("ext_") and n not in _DRIVER_WINDOW
    ]
    ordered = _DRIVER_WINDOW + rest_core + rest_ext
    if sorted(ordered) != sorted(REGISTRY):
        raise RuntimeError("registry reorder dropped/duplicated entries")
    snapshot = dict(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update({n: snapshot[n] for n in ordered})


_reorder()
