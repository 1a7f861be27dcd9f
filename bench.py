#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Methodology (round 5): one warm-up execution of the smallest headline query
to absorb JVM/codegen startup, then each headline query is planned fresh and
executed THREE times; the reported time is the min of the three (steady-state
throughput — first executions fold in one-off shuffle-file and codegen-cache
effects that have nothing to do with the plan; this machine shows up to ±2x
ambient noise on sub-second queries, which min-of-2 demonstrably could not
reject — see VERDICT round 3).  Each run materializes the FULL result through
a noop datasource write (every column evaluated and serialized), not
``df.count()``, which lets Spark skip projection-only column work."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dp1_data_wrangling_spark.queries import REGISTRY, headline_queries  # noqa: E402
from dp1_data_wrangling_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None

    spark = get_spark("dp1-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df) -> None:
        # Full materialization: the noop sink evaluates and serializes every
        # output column (count() can prune a projection down to nothing).
        df.write.format("noop").mode("overwrite").save()

    # warm-up: JVM, parquet footer caches, codegen
    try:
        materialize(REGISTRY["find_first"].fn(spark, sf_dir))
    except Exception as exc:  # noqa: BLE001 - warm-up failure is not fatal
        print(f"warm-up failed: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, spec in headline_queries().items():
        best = float("inf")
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                df = spec.fn(spark, sf_dir)
                materialize(df)
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001 - one bad query must not
            # lose the whole benchmark record
            errors[name] = str(exc)[:200]
            print(f"bench query {name} failed: {exc}", file=sys.stderr)

    # Empirical scale sweep: time the same plans one SF down and record the
    # 10x-rows timing ratio.  Fixed plan/launch overhead compresses the
    # ratio at these sizes (expect low single digits); a quadratic plan
    # (e.g. the O(n^2) self-join certify_probe's sort-neighbor window
    # replaces) would show ~100x growth in the data-dependent part.
    # priority_dedup joined the sweep in round 6 to adjudicate its r5
    # timing wobble: its claimed shape is one min_by shuffle, so the ratio
    # must stay in the same low-single-digit class.  doc_line_dedup joined
    # later in round 6 as the LLM-tier probe: census + anti-join + regroup
    # are all linear-class, so its ratio belongs in the same band (the
    # line census would betray a quadratic pair-expansion instantly).
    scaling: dict[str, dict] = {}
    small_dir = sf_dir.replace("sf0.1", "sf0.01")
    if small_dir != sf_dir and os.path.isdir(small_dir):
        for probe in ("certify_probe", "priority_dedup", "doc_line_dedup"):
            if probe not in timings:
                continue
            try:
                # Same min-of-3 methodology as the headline numbers: a
                # single un-warmed small-SF run carries cold parquet-footer
                # and codegen caches for that data, inflating small_sf_sec
                # and biasing the ratio downward (ADVICE r5).
                small_t = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    materialize(REGISTRY[probe].fn(spark, small_dir))
                    small_t = min(small_t, time.perf_counter() - t0)
                scaling[probe] = {
                    "small_sf_sec": round(small_t, 3),
                    "sec": timings[probe],
                    "ratio_10x_rows": round(timings[probe] / small_t, 2),
                }
            except Exception as exc:  # noqa: BLE001 - sweep is informational
                print(f"scale sweep failed for {probe}: {exc}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    record = {
        "metric": "headline_queries_total_wall",
        # a partial total would read as a speedup — report null on failure
        "value": None if errors else total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_num,
    }
    if scaling:
        record["scaling"] = scaling
    if errors:
        record["errors"] = errors
        record["partial_total"] = total
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
