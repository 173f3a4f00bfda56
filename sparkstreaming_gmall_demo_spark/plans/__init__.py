from .registry import REGISTRY, QuerySpec  # noqa: F401
from . import extensions  # noqa: F401  (registers extension queries)

# The external correctness driver oracle-checks only the FIRST 50
# registry entries (round-1 finding). Dict order therefore IS the
# driver-visibility order.
#
# Round-8 rotation (per VERDICT r7 item 1 — staleness consolidation):
# the cross-round ledger is complete (146/146 entries with >= 1
# driver-green row after r7), so the window now runs the builder's own
# <= 3-round staleness policy (SURVEY 2.13 r5 note). Recomputed from
# the CORRECTNESS_r01-r07 union this round: 18 entries' newest green
# row is r4 (q2/q4/q4b/q7-q9/q24-q35 — three rounds old, AT the
# ceiling) and 39 extensions' newest is r5. Seats:
#   - 8 core sentinels (unchanged — the cross-cutting regression trip
#     wires: dedup-count, decimal money, the 3-way join, the windowed
#     alert, scored search, both sessionization variants, banded
#     ratios);
#   - ALL 18 r4-stale entries;
#   - the first 24 (name order, deterministic) of the 39 r5-stale
#     extensions — the remaining 15 (ext_pq_topk..ext_unigram_
#     surprisal) are the r9 rotation queue together with any entries
#     registered after this window froze.
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

_STALE_R4 = [
    # newest driver-green row is r4 (all 18, name order)
    "q24_corpus_cube",
    "q25_funnel_daily",
    "q26_next_day_retention",
    "q27_sliding_window_counts",
    "q28_priority_stats",
    "q29_topk_per_type",
    "q2_dau_hourly",
    "q30_grouping_sets",
    "q31_moving_gmv",
    "q32_above_customer_avg",
    "q33_value_histogram",
    "q34_entry_exit_pairs",
    "q35_range_frame_gmv",
    "q4_gmv_hourly",
    "q4b_purchase_value_hourly",
    "q7_first_per_group",
    "q8_topk_users",
    "q9_keyword_search",
]

_STALE_R5 = [
    # newest driver-green row is r5 (first 24 of 39, name order)
    "ext_approx_distinct",
    "ext_approx_quantiles",
    "ext_bigram_surprisal",
    "ext_bloom_gate",
    "ext_bm25_topk",
    "ext_boilerplate_coverage",
    "ext_bpe_token_count",
    "ext_context_packing",
    "ext_corpus_curation",
    "ext_cosine_topk",
    "ext_decode_stub",
    "ext_document_chunks",
    "ext_embedding_neardup",
    "ext_fingerprint_dedup",
    "ext_hll_partials",
    "ext_hybrid_rrf",
    "ext_jaccard_neardup",
    "ext_langid_confusion",
    "ext_leakage_safe_splits",
    "ext_lsh_topk",
    "ext_nation_pagerank",
    "ext_neardup_components",
    "ext_ngram_jaccard_neardup",
    "ext_payload_neardup",
]

_DRIVER_WINDOW = _CORE_SENTINELS + _STALE_R4 + _STALE_R5

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
