#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Methodology: one warm-up execution of the smallest headline query to absorb
JVM/codegen startup, then each headline query is planned fresh and executed
twice; the reported time is the min of the two runs (steady-state throughput
— first executions fold in one-off shuffle-file and codegen-cache effects
that have nothing to do with the plan).  Timing covers logical-plan build
through full materialization."""

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

    # warm-up: JVM, parquet footer caches, codegen
    try:
        REGISTRY["find_first"].fn(spark, sf_dir).count()
    except Exception as exc:  # noqa: BLE001 - warm-up failure is not fatal
        print(f"warm-up failed: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, spec in headline_queries().items():
        best = float("inf")
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                df = spec.fn(spark, sf_dir)
                df.count()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001 - one bad query must not
            # lose the whole benchmark record
            errors[name] = str(exc)[:200]
            print(f"bench query {name} failed: {exc}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    record = {
        "metric": "headline_queries_total_wall",
        # a partial total would read as a speedup — report null on failure
        "value": None if errors else total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_num,
    }
    if errors:
        record["errors"] = errors
        record["partial_total"] = total
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
