"""Every oracle-checked query must hash-match DuckDB at sf0.001 (the
driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from dp1_data_wrangling_spark.queries import REGISTRY

from .conftest import SMOKE_SF
from .oracle_harness import compare, duckdb_con

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SMOKE_SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, con, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SMOKE_SF)
    compare(df, con, spec.oracle, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SMOKE_SF)
    assert df.count() >= 0 and len(df.schema) > 0


def test_entry_smoke(spark):
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "__spark_entry__.py"
    mod_spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(mod_spec)
    mod_spec.loader.exec_module(mod)
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert mod.queries().keys() >= mod.oracle_sql().keys()


def test_driver_window_covers_flagship_surface():
    """The driver's correctness run caps at the first 50 registry entries:
    the flagship LLM/streaming surface must sit inside that window, no
    query may be lost by the reorder, and every window entry bar the
    honest rows-only ones (stubbed multimodal codecs, float-sign LSH ANN)
    must be oracle-backed."""
    from dp1_data_wrangling_spark.queries import DRIVER_WINDOW

    names = list(REGISTRY)
    assert names[:50] == DRIVER_WINDOW
    assert len(names) == len(set(names))
    flagship = {
        "doc_exact_dedup", "minhash_pairs", "simhash_pairs", "jaccard_pairs",
        "dedup_clusters", "embedding_near_dup", "doc_token_stats",
        "doc_lang_id", "doc_fingerprint", "cosine_topk", "lsh_recall_bound",
        "ivf_recall_bound", "multimodal_features", "multimodal_resize",
        "multimodal_frames", "tumbling_window", "sliding_window",
        "session_window", "event_correlation", "chain_flatten_distributed",
        "approx_distinct", "approx_percentile",
    }
    assert flagship <= set(names[:50])
    rows_only_ok = {
        "multimodal_features", "multimodal_resize", "multimodal_frames",
    }
    for n in names[:50]:
        if n not in rows_only_ok:
            assert REGISTRY[n].oracle, f"{n} in driver window without oracle"
