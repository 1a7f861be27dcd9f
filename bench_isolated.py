#!/usr/bin/env python
"""Isolated per-query clean-window measurement (VERDICT r12 item 1).

Runs the named registry queries ALONE (no suite around them, no probe
blocks) at $SPARK_GRAFT_SF_DIR with the bench.py admission gate in
front: the timed block is held until the host JVM reference reads
clean (<= 0.07s) or the gate budget expires.  Each query is planned
fresh and fully materialized N times (default 5, min-of-N reported),
with the machine reference sampled BEFORE and AFTER the block so the
record proves what the host was doing while the numbers were taken.

    python bench_isolated.py doc_link_triangles doc_link_pagerank

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_BENCH_GATE_SEC (gate budget, default 600; 0 = no gate),
SPARK_GRAFT_BENCH_REPS (default 5).

Prints ONE JSON line; also appends to bench_runs/isolated_runs.jsonl
so every sample across the session is preserved for the round record.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dp1_data_wrangling_spark.queries import REGISTRY  # noqa: E402
from dp1_data_wrangling_spark.session import get_spark  # noqa: E402

from bench import jvm_ref_probe, wait_for_clean_host  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: bench_isolated.py QUERY [QUERY ...]", file=sys.stderr)
        raise SystemExit(2)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        raise SystemExit(2)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    gate_budget = float(os.environ.get("SPARK_GRAFT_BENCH_GATE_SEC", "600"))

    spark = get_spark("dp1-bench-isolated")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, codegen, parquet footers (outside every timed rep)
    REGISTRY[names[0]].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    gate = (
        wait_for_clean_host(spark, gate_budget) if gate_budget > 0 else None
    )
    ref_before = jvm_ref_probe(spark)

    results: dict[str, dict] = {}
    for name in names:
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.perf_counter() - t0, 3))
        results[name] = {"min_sec": min(walls), "walls": walls}

    ref_after = jvm_ref_probe(spark)
    record = {
        "metric": "isolated_min_of_n",
        "reps": reps,
        "sf_dir": sf_dir,
        "queries": results,
        "machine_ref_before": ref_before,
        "machine_ref_after": ref_after,
        "clean_block": ref_before["machine_clean"]
        and ref_after["machine_clean"],
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    if gate is not None:
        record["gate"] = gate
    out_dir = Path(__file__).resolve().parent / "bench_runs"
    out_dir.mkdir(exist_ok=True)
    with (out_dir / "isolated_runs.jsonl").open("a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
