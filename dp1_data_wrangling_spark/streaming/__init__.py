"""Structured Streaming surface (SURVEY.md §2.10).

The reference is pure batch; the engine adds the streaming-shaped surface
over the same DataFrame operators.  Every streaming query has a batch
equivalent on the events table (that is what the DuckDB oracle checks);
``events.py`` holds the shared transformations plus readStream wiring.
"""

from .events import (
    correlated_events_batch,
    session_windows_batch,
    sliding_windows_batch,
    stream_correlated_events,
    stream_correlated_events_outer,
    stream_dedup_events,
    stream_events,
    stream_static_enrich,
    stream_tumbling_counts,
    to_event_time,
    tumbling_windows_batch,
)
from .curation import read_curated, stream_curation
from .decontam import (
    SEM_CLEAN_TABLE,
    SEM_FLAGGED_TABLE,
    read_clean,
    read_flagged,
    stream_decontaminate,
    stream_semantic_decontaminate,
)
from .dedup_llm import stream_minhash_dedup
from .ann import stream_ivf_index_append
from .rollup import stream_rollup
from .geofence import stream_geofence
from .drift import read_psi, stream_ks_drift
from .funnel import stream_funnel
from .rebuild import (
    read_cohort_ltv,
    read_retention_cohorts,
    read_transition_matrix,
    stream_attribution,
    stream_cohort_ltv,
    stream_keyed_rebuild,
    stream_retention,
    stream_sessions,
    stream_transitions,
)
from .census import (
    read_anova,
    read_benford,
    read_classification_report,
    read_cmh,
    read_cohens_kappa,
    read_cuped_ate,
    read_heavy_hitters,
    read_kruskal_wallis,
    read_log_rank,
    read_nelson_aalen,
    read_ohlc,
    read_post_strat_ate,
    read_srm,
    read_table_profile,
    read_cusum_alarms,
    read_grid_hotspots,
    read_seasonal_profile,
    read_simpson,
    stream_census,
)
from .ranking import read_rank_tiles, stream_rank_census
from .scd import stream_scd2
from .sketches import stream_sketches
from .semantic import read_semantic_survivors, stream_semantic_dedup
from .sinks import stream_into_catalog
from .stateful import incremental_find_first
from .text_index import stream_text_index_append
from .training_export import finalize_training_export

__all__ = [
    "tumbling_windows_batch",
    "sliding_windows_batch",
    "session_windows_batch",
    "correlated_events_batch",
    "stream_events",
    "to_event_time",
    "stream_tumbling_counts",
    "stream_correlated_events",
    "stream_correlated_events_outer",
    "stream_dedup_events",
    "stream_static_enrich",
    "incremental_find_first",
    "stream_into_catalog",
    "stream_semantic_dedup",
    "stream_semantic_decontaminate",
    "SEM_CLEAN_TABLE",
    "SEM_FLAGGED_TABLE",
    "read_semantic_survivors",
    "stream_ivf_index_append",
    "stream_text_index_append",
    "stream_minhash_dedup",
    "stream_curation",
    "read_benford",
    "read_classification_report",
    "read_anova",
    "read_cmh",
    "read_cohens_kappa",
    "read_cuped_ate",
    "read_heavy_hitters",
    "read_kruskal_wallis",
    "read_log_rank",
    "read_nelson_aalen",
    "read_ohlc",
    "read_post_strat_ate",
    "read_srm",
    "read_table_profile",
    "read_cusum_alarms",
    "read_grid_hotspots",
    "read_seasonal_profile",
    "read_simpson",
    "read_rank_tiles",
    "stream_census",
    "stream_rank_census",
    "stream_rollup",
    "read_cohort_ltv",
    "read_retention_cohorts",
    "read_transition_matrix",
    "stream_attribution",
    "stream_cohort_ltv",
    "stream_funnel",
    "stream_keyed_rebuild",
    "read_psi",
    "stream_ks_drift",
    "stream_scd2",
    "stream_retention",
    "stream_sessions",
    "stream_transitions",
    "stream_geofence",
    "stream_sketches",
    "read_curated",
    "finalize_training_export",
]
