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
    # -- core data plane --
    "events_type_hour_independence",  # r11: RxC chi-square independence
    "doc_link_communities",       # r10: label-propagation communities
    "export_plan",                # flagship end-to-end export pipeline (J1/P5/A3/A8)
    "documents_profile_drift",    # r13 NEW: snapshot profile-drift audit
                                  #   (planted extraction regression + schema
                                  #   change; replaces 5x-green
                                  #   user_scd2_history — SCD2 evidence
                                  #   continues via the streaming equivalence
                                  #   suite + in-repo parity every CI run)
    # -- event analytics (r8: funnel / retention / Markov) --
    "events_diff_in_diff",        # r11: difference-in-differences readout
    "customer_k_anonymity",       # r13 NEW: k-anonymity/l-diversity privacy audit
                                  #   (replaces 3x-green customer_rfm_segments;
                                  #   ranking family keeps deciles/summary/lorenz)
    "doc_quality_survivors",      # r12: keep-BEST-per-cluster curation dedup
    "events_quantile_normalize",  # r10: exact rank-based QN calibration
    "events_kmv_distinct",        # r13 window (VERDICT r12 item 2): KMV distinct
                                  #   sketch — never externally checked before;
                                  #   replaces 3x-green events_hll_rolling (sketch
                                  #   family rep maintained)
    # -- LLM curation tier --
    "events_calibration_curve",   # r13 NEW: exact reliability diagram + ECE
                                  #   (replaces 5x-green doc_semantic_decontam;
                                  #   decontam keeps corpus_ngram_overlap
                                  #   in-window + the streaming twins + parity)
    "doc_collocations",           # r12: PMI-class lift collocations (exact ppm)
    "events_classification_report",  # r13 NEW mid-round: per-class
                                  #   precision/recall/F1 (planted mislabeler;
                                  #   replaces 5x-green multimodal_qoi — the
                                  #   codec family's 7 REAL decoders stay
                                  #   parity-held every CI run)
    "doc_dup_rate_by_source",     # r12: per-source duplication-rate report
    "doc_link_prediction",        # r11: common-neighbor/Jaccard link prediction
    "events_post_strat_ate",      # r13 NEW mid-round: post-stratification
                                  #   ATE (planted cross-stratum assignment
                                  #   imbalance; replaces 3x-green
                                  #   orders_gini_concentration — the
                                  #   concentration family keeps
                                  #   customer_lorenz_curve +
                                  #   doc_source_lang_simpson in-window)
    "orders_value_deciles",       # r11: fact-scale distributed ntile + percent-rank
    "lineitem_weighted_quantiles",  # r10: exact weighted quantiles
    # -- dedup / similarity families --
    "doc_link_ppr",               # r10: personalized PageRank (exact integer)
    "events_cuped_ate",           # r13 NEW mid-round: CUPED variance-reduced
                                  #   ATE (WSDM'13; replaces 3x-green
                                  #   events_value_bins — the histogram family
                                  #   keeps lineitem_weighted_quantiles +
                                  #   orders_value_deciles in-window, value
                                  #   bins stay parity-held every CI run)
    "event_bounce_rate",          # r12: per-landing-type bounce rate (exact ppm)
    "customer_entity_resolution", # r10: PassJoin->CC->golden record
    "user_churn_survival",        # r11: exact Kaplan-Meier churn curves
    "events_rater_agreement",     # r13 NEW mid-round: Cohen's-kappa
                                  #   inter-rater agreement (planted
                                  #   worse-than-chance rater exercises the
                                  #   sign-split; replaces 5x-green
                                  #   ivf_pq_recall_bound — the ANN family's
                                  #   five recall bounds + topk replays stay
                                  #   parity-held every CI run)
    "orders_rollup_report",       # r13 NEW: native ROLLUP subtotal report
                                  #   (replaces 5x-green doc_gopher_rules; the
                                  #   quality-screen family keeps
                                  #   table_expectations + doc_quality_survivors)
    "events_rank_sum",            # r11: exact Mann-Whitney U rank-sum A/B readout
    "doc_df_drift",               # r12: vocabulary document-frequency drift screen
    "event_attribution_position", # r11: U-shaped attribution (exact credits)
    "order_item_affinity",        # r11: item-item cosine^2 affinity (exact ppm)
    "events_trend_test",          # r11: Mann-Kendall trend + Theil-Sen slope
    "events_stickiness",          # r11: exact DAU / rolling-active stickiness
    "event_session_funnel",       # r11: session-scoped funnel composition
    "customer_lorenz_curve",      # r11: cumulative-share curve on distributed_rank
    "orders_decile_summary",      # r12: NTILE boundary summary from the value census
    "events_throttle",            # r11: gap-rule burst dedup / throttling
    "user_cohort_ltv",            # r11: weekly cohort LTV triangle (exact milli)
    "warehouse_fk_orphans",       # r13 NEW: referential-integrity orphan audit
                                  #   (replaces 4x-green events_gapfill; timeseries
                                  #   family keeps mase/trend/seasonal_profile)
    "orders_benford",             # r11: Benford first-digit conformity screen
    "order_brand_rules",          # r10: association rules w/ exact lift
    "events_roc_curve",           # r13 NEW: exact ROC curve + trapezoid AUC
                                  #   (replaces 3x-green doc_jaccard_join; dedup
                                  #   family keeps dup_rate + quality_survivors)
    # -- sampling / packing / curation tail (r7 audit rotation) --
    "events_uplift_curve",        # r13 NEW: exact uplift/Qini curve (planted
                                  #   heterogeneous effect; replaces 4x-green
                                  #   table_expectations — the data-quality
                                  #   family keeps warehouse_fk_orphans +
                                  #   doc_quality_survivors in-window)
    "events_seasonal_profile",    # r11: exact ratio-to-mean seasonal indices
    "bm25_ndcg_eval",             # r13 window (VERDICT r12 item 2): BM25 NDCG@k
                                  #   eval — never externally checked before;
                                  #   replaces 4x-green doc_bm25_topk (retrieval
                                  #   family rep maintained)
    "corpus_ngram_overlap",       # r12: corpus-level 5-gram overlap share
    "corpus_heaps_law",           # r13 NEW: Heaps-law vocabulary-growth report
                                  #   (replaces 4x-green events_changepoints; the
                                  #   CUSUM core keeps its streaming census twin +
                                  #   in-repo parity every CI run)
    "brand_momentum",             # r11: two-period momentum screen (exact ppm)
    "events_seasonal_mase",       # r11: seasonal-naive forecast accuracy
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
