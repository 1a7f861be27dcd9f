"""Oracle-checked query catalog.

One entry per implemented operator family from SURVEY.md §2.  Each entry
pairs a Spark DataFrame implementation with the equivalent ANSI SQL for the
DuckDB oracle (prefixed with the fixture CTEs from ``fixtures.ORACLE_CTES``).

Determinism contract (the driver hash-compares values):

- Every computed column is aliased identically on both sides.
- Money/double aggregates go through **exact fixed-point**: doubles are
  scaled to integer cents/micros *per row* (deterministic), summed as
  BIGINT (associative — immune to partition/accumulation order), and only
  then converted back to double by a single division.  Spark's parallel
  partial aggregation and DuckDB's sequential sums then agree bitwise.
- Ranking windows always carry a unique tie-breaker column.
- Timestamps are µs-clean in the fixtures; session timezone is UTC.
"""

from __future__ import annotations

from .registry import REGISTRY, QuerySpec, prioritize



# Import the family catalogs IN ORDER so their @register calls populate
# REGISTRY with the exact pre-split sequence (prioritize() then reorders
# the driver window to the front).  Split in round 11: queries.py had
# grown ~500 lines/round; the seams are the registry's family sections.
from . import queries_core  # noqa: E402,F401
from . import queries_analytics  # noqa: E402,F401
from . import queries_events  # noqa: E402,F401
from . import queries_llm  # noqa: E402,F401
# Round-13 seam split (VERDICT r12 item 6): dedup / multimodal /
# curation moved out of queries_llm.py (back past 3,400 lines after
# the r12 split) — same @register calls, registry name set identical;
# imported right after their former host, same as the r12 splits.
from . import queries_dedup  # noqa: E402,F401
from . import queries_multimodal  # noqa: E402,F401
from . import queries_curation  # noqa: E402,F401
# Round-12 seam split (VERDICT r11 item 8): the graph and retrieval
# tiers moved out of queries_llm.py (which had grown past 4,000 lines)
# into their own modules — same @register calls, registry name set
# identical; imported here right after their former host so the
# non-window registry tail keeps its family grouping.
from . import queries_graph  # noqa: E402,F401
from . import queries_retrieval  # noqa: E402,F401
from . import queries_streaming  # noqa: E402,F401
# The driver's correctness run caps at the first 50 registry entries
# (``prioritize`` reorders the registry so this window leads).  Everything
# after position 50 is still verified by tests/test_oracle_parity.py —
# the identical DuckDB comparison over every registered oracle, each CI
# run.  Rotation policy: brand-new operators enter the window directly;
# entries with multi-round consecutive driver-green history rotate out
# (weakest evidence first), always leaving one representative per
# operator family in-window.  The full round-by-round rotation history
# lives in BASELINE.md ("Driver-window rotation history").
from . import queries_extended  # noqa: E402,F401
# Round-13 split (VERDICT r12 item 6): the r11 fact-scale ranking &
# experimentation tier moved out of queries_extended.py.
from . import queries_experiments  # noqa: E402,F401
# Round-13 new surface: governance/eval tier (privacy audit,
# referential integrity, Heaps-law corpus growth, exact ROC curve).
from . import queries_quality  # noqa: E402,F401

# Re-exports preserved for external consumers (tests, bench, entry):
from .queries_core import nested_regroup_df  # noqa: E402,F401
from .queries_analytics import (  # noqa: E402,F401
    APPROX_DISTINCT_RSD,
    APPROX_DISTINCT_TOL,
)

DRIVER_WINDOW: list[str] = [
    # ---- r14 rotation (VERDICT r13 item 1): the operators REWRITTEN in
    # the two optimization rounds lead the window, so the driver's own
    # oracle re-checks every touched hot path this round (r13's rotation
    # left them covered only by in-window siblings + in-repo parity).
    # 15 multi-round-green untouched entries rotate out (weakest external
    # evidence first, one representative per operator family retained —
    # per-entry notes below and in tests/test_oracle_parity.py; full
    # history in BASELINE.md "Driver-window rotation history").
    # -- r13/r14-rewritten operator paths --
    "doc_bm25_topk",              # r13 rewrite: corpus-stats fold + query-vocab
                                  #   semi-join (the postings shuffle removal) —
                                  #   re-enters one round after rotating out;
                                  #   replaces 3x-green events_rank_sum (rank-test
                                  #   family keeps events_trend_test in-window)
    "simhash_pairs",              # r13 rewrite: 60 array passes -> one lane-packed
                                  #   fold; replaces 3x-green events_throttle
                                  #   (burst/gap family keeps event_session_funnel)
    "minhash_pairs",              # r13 rewrite: NULL-init least() fold; replaces
                                  #   3x-green event_attribution_position (journey
                                  #   family keeps event_session_funnel; both
                                  #   attribution forms stay parity-held every CI)
    "doc_fuzzy_pairs",            # r13 rewrite: row-local probe dedup + lazy
                                  #   keyed checkpoint (10->4 exchanges); replaces
                                  #   2x-green doc_df_drift (drift family keeps
                                  #   documents_profile_drift in-window)
    "dedup_clusters",             # r13 rewrite: CC label-sum convergence probe;
                                  #   replaces 2x-green doc_dup_rate_by_source
                                  #   (dup-reporting family keeps
                                  #   doc_quality_survivors + four dedup reps)
    "doc_exact_dedup",            # r13 rewrite: spread() redundant-exchange fix;
                                  #   replaces 2x-green doc_collocations (text-stat
                                  #   family keeps corpus_heaps_law +
                                  #   corpus_ngram_overlap in-window)
    "doc_link_pagerank",          # r13 rewrite: fused recombine round + keyed
                                  #   checkpoints (91->51 jobs); replaces 3x-green
                                  #   events_type_hour_independence (chi-square
                                  #   family keeps events_ab_experiment in-window)
    "doc_link_triangles",         # r13 rewrite: co-partitioned wedge self-join;
                                  #   replaces 3x-green customer_lorenz_curve
                                  #   (concentration family keeps
                                  #   doc_source_lang_simpson; ranking keeps
                                  #   orders_value_deciles in-window)
    "embedding_semantic_dedup",   # r13 rewrite: keyed-checkpointed SRP signature
                                  #   table + r14 dot()/l2_norm A/B; replaces
                                  #   3x-green user_cohort_ltv (customer family
                                  #   keeps customer_k_anonymity +
                                  #   user_churn_survival in-window)
    "cosine_topk",                # r13 rewrite consumer (dot/l2_norm fold — the
                                  #   r14 A/B target); replaces 2x-green
                                  #   orders_decile_summary (ranking family keeps
                                  #   orders_value_deciles in-window)
    "doc_semantic_decontam",      # r13-rewritten semantic tier, rotated out the
                                  #   same round it was touched — back for fresh
                                  #   external evidence; replaces 3x-green
                                  #   events_seasonal_mase (timeseries family
                                  #   keeps events_seasonal_profile + trend_test)
    "events_geofence",            # r13 rewrite: md5-chain checkpoint + per-polygon
                                  #   edge table (4->2 exchanges; the one touched
                                  #   query still reading regressed in PERF_r13);
                                  #   replaces 2x-green event_bounce_rate (session
                                  #   family keeps event_session_funnel in-window)
    "certify_probe",              # r13 rewrite: bare-END running max; replaces
                                  #   4x-green lineitem_weighted_quantiles
                                  #   (quantile family keeps orders_value_deciles)
    "multimodal_decode",          # r14 rewrite: synthesize+decode fused into one
                                  #   mapInPandas (guide §4); replaces 3x-green
                                  #   events_diff_in_diff (experiment family keeps
                                  #   cuped_ate + post_strat_ate + ab_experiment)
    "multimodal_png",             # r14 rewrite: same fusion, zlib-PNG codec path;
                                  #   replaces 4x-green events_quantile_normalize
                                  #   (calibration family keeps
                                  #   events_calibration_curve in-window)
    # -- core data plane --
    "doc_link_communities",       # r10: label-propagation communities (r13 fused
                                  #   argmax round — stays for a 2nd checked round)
    "export_plan",                # flagship end-to-end export pipeline (J1/P5/A3/A8)
    "documents_profile_drift",    # r13 NEW: snapshot profile-drift audit
                                  #   (planted extraction regression + schema
                                  #   change; replaces 5x-green
                                  #   user_scd2_history — SCD2 evidence
                                  #   continues via the streaming equivalence
                                  #   suite + in-repo parity every CI run)
    "customer_k_anonymity",       # r13 NEW: k-anonymity/l-diversity privacy audit
                                  #   (replaces 3x-green customer_rfm_segments;
                                  #   ranking family keeps orders_value_deciles)
    "doc_quality_survivors",      # r12: keep-BEST-per-cluster curation dedup
    "events_kmv_distinct",        # r13 window (VERDICT r12 item 2): KMV distinct
                                  #   sketch — never externally checked before;
                                  #   replaces 3x-green events_hll_rolling (sketch
                                  #   family rep maintained)
    # -- LLM curation tier --
    "events_calibration_curve",   # r13 NEW: exact reliability diagram + ECE
    "events_classification_report",  # r13 NEW mid-round: per-class
                                  #   precision/recall/F1 (planted mislabeler)
    "doc_link_prediction",        # r11: common-neighbor/Jaccard link prediction
                                  #   (r13 deg-before-wedge rewrite — 2nd round)
    "events_post_strat_ate",      # r13 NEW mid-round: post-stratification ATE
    "orders_value_deciles",       # r11: fact-scale distributed ntile + percent-rank
    "doc_link_ppr",               # r10: personalized PageRank (exact integer;
                                  #   r13 fused-round rewrite — 2nd checked round)
    "events_cuped_ate",           # r13 NEW mid-round: CUPED variance-reduced ATE
    "customer_entity_resolution", # r10: PassJoin->CC->golden record (r13 CC
                                  #   label-sum rewrite — 2nd checked round)
    "user_churn_survival",        # r11: exact Kaplan-Meier churn curves
    "events_rater_agreement",     # r13 NEW mid-round: Cohen's-kappa agreement
    "orders_rollup_report",       # r13 NEW: native ROLLUP subtotal report
    "order_item_affinity",        # r11: item-item cosine^2 affinity (r13+r14
                                  #   itemsets census rewrite)
    "events_trend_test",          # r11: Mann-Kendall trend + Theil-Sen slope
                                  #   (r13 shared census-checkpoint reuse)
    "events_stickiness",          # r11: exact DAU / rolling-active stickiness
    "event_session_funnel",       # r11: session-scoped funnel composition (r13
                                  #   sessionized-stream checkpoint)
    "warehouse_fk_orphans",       # r13 NEW: referential-integrity orphan audit
    "orders_benford",             # r11: Benford first-digit conformity screen
    "order_brand_rules",          # r10: association rules w/ exact lift (r13+r14
                                  #   itemsets census rewrite — the top headliner)
    "events_roc_curve",           # r13 NEW: exact ROC curve + trapezoid AUC
    "events_uplift_curve",        # r13 NEW: exact uplift/Qini curve
    "events_seasonal_profile",    # r11: exact ratio-to-mean seasonal indices
    "bm25_ndcg_eval",             # r13 window (VERDICT r12 item 2): BM25 NDCG@k
    "corpus_ngram_overlap",       # r12: corpus-level 5-gram overlap share
    "corpus_heaps_law",           # r13 NEW: Heaps-law vocabulary-growth report
    "brand_momentum",             # r11: two-period momentum screen (r13 census
                                  #   checkpoint reuse)
    "events_ab_experiment",       # r11: exact chi-square A/B readout
    "events_grid_hotspots",       # r11: census-stencil Moore concentration
    # -- graph / time series --
    "lineitem_corr_matrix",       # r10: one-pass Pearson correlation matrix
    "doc_source_lang_simpson",    # r12: Simpson mix-concentration index (exact ppm)
]
if len(DRIVER_WINDOW) != 50:  # explicit raise: survives python -O
    raise ValueError(
        f"DRIVER_WINDOW must list exactly the 50 driver-checked queries, "
        f"got {len(DRIVER_WINDOW)}"
    )
prioritize(DRIVER_WINDOW)


def headline_queries() -> dict[str, QuerySpec]:
    return {n: s for n, s in REGISTRY.items() if s.headline}
