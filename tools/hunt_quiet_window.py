#!/usr/bin/env python
"""Quiet-window hunter (r13): the admission gate's burst probe
(50M range-sum) can read clean while the per-job scheduling floor is
still 3-10x its healthy level — and the floor is what many-job queries
pay (BASELINE.md "Round-13 root cause").  This loop probes BOTH
dimensions every ``interval`` seconds and, when the host is quiet by
the FLOOR criterion too (tiny 1-task job <= 35 ms — the r9-era level
that reproduces the graph records is ~20 ms), immediately runs the
isolated min-of-N for the named queries and appends to
``bench_runs/isolated_runs.jsonl``.  Every probe is also appended to
``bench_runs/quiet_hunt.jsonl`` so the round record can show the
distribution the host actually offered.

    python tools/hunt_quiet_window.py doc_link_triangles doc_link_pagerank

Env: SPARK_GRAFT_HUNT_ROUNDS (default 40), SPARK_GRAFT_HUNT_INTERVAL
(default 480 s), SPARK_GRAFT_HUNT_FLOOR_MS (default 35),
SPARK_GRAFT_HUNT_JVM_SEC (default 0 = strict machine_clean admission;
>0 relaxes the jvm criterion to that wall for opportunistic-dip
sampling — every record carries the thresholds it was admitted under).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dp1_data_wrangling_spark.queries import REGISTRY  # noqa: E402
from dp1_data_wrangling_spark.session import get_spark  # noqa: E402

from bench import jvm_ref_probe  # noqa: E402


def tiny_task_floor(spark) -> float:
    best = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        spark.range(1).count()
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 1)


def main() -> None:
    names = sys.argv[1:] or ["doc_link_triangles", "doc_link_pagerank"]
    rounds = int(os.environ.get("SPARK_GRAFT_HUNT_ROUNDS", "40"))
    interval = float(os.environ.get("SPARK_GRAFT_HUNT_INTERVAL", "480"))
    floor_ms = float(os.environ.get("SPARK_GRAFT_HUNT_FLOOR_MS", "35"))
    # Opportunistic-dip mode (r13 closing session): on a host whose jvm
    # ref NEVER enters the 0.07 clean band but dips to ~1.7-1.8x for a
    # few minutes at a time, a relaxed jvm threshold lets the hunter
    # catch the dips and take best-available isolated samples.  The
    # default (0 = unset) keeps the strict machine_clean criterion; a
    # relaxed run is self-documenting — every isolated record carries
    # its before/after probes, so a reader sees the actual ambient.
    jvm_sec = float(os.environ.get("SPARK_GRAFT_HUNT_JVM_SEC", "0"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("dp1-quiet-hunt")
    spark.sparkContext.setLogLevel("ERROR")
    # warm once so probes measure the host, not JVM startup
    REGISTRY[names[0]].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out_dir = Path(__file__).resolve().parent.parent / "bench_runs"
    out_dir.mkdir(exist_ok=True)
    hunt_log = out_dir / "quiet_hunt.jsonl"
    iso_log = out_dir / "isolated_runs.jsonl"

    # Fixed strict constants for clean_block (ADVICE r13): a "clean
    # block" means the SAME thing in every row of the shared jsonl,
    # independent of whatever relaxed admission this run used — both
    # bracketing probes machine_clean (jvm <= 0.07) and both tiny-task
    # floors at the strict 35 ms criterion.
    STRICT_FLOOR_MS = 35.0

    for i in range(rounds):
        probe = jvm_ref_probe(spark)
        probe["tiny_1task_ms"] = tiny_task_floor(spark)
        probe["ts"] = time.strftime("%H:%M:%S")
        # persist the ACTIVE admission thresholds (ADVICE r13: strict-
        # and relaxed-mode rows were indistinguishable in the jsonl)
        probe["admit_floor_ms"] = floor_ms
        probe["admit_jvm_sec"] = jvm_sec if jvm_sec > 0 else None
        jvm_ok = (
            probe["jvm_range_sum_sec"] <= jvm_sec
            if jvm_sec > 0
            else probe["machine_clean"]
        )
        quiet = jvm_ok and probe["tiny_1task_ms"] <= floor_ms
        probe["quiet_by_floor"] = quiet
        with hunt_log.open("a") as f:
            f.write(json.dumps(probe) + "\n")
        print(f"hunt {i}: {probe}", file=sys.stderr)
        if quiet:
            results = {}
            for name in names:
                walls = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    REGISTRY[name].fn(spark, sf_dir).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    walls.append(round(time.perf_counter() - t0, 3))
                results[name] = {"min_sec": min(walls), "walls": walls}
            after = jvm_ref_probe(spark)
            after["tiny_1task_ms"] = tiny_task_floor(spark)
            record = {
                "metric": "isolated_min_of_n",
                "reps": 5,
                "sf_dir": sf_dir,
                "queries": results,
                "machine_ref_before": probe,
                "machine_ref_after": after,
                "admit_floor_ms": floor_ms,
                "admit_jvm_sec": jvm_sec if jvm_sec > 0 else None,
                # strict, admission-independent (ADVICE r13): BOTH
                # bracketing probes machine_clean AND at the fixed 35 ms
                # tiny-task floor — a relaxed-admission run can no longer
                # mint a clean_block weaker than strict-mode rows
                "clean_block": probe["machine_clean"]
                and after["machine_clean"]
                and probe["tiny_1task_ms"] <= STRICT_FLOOR_MS
                and after["tiny_1task_ms"] <= STRICT_FLOOR_MS,
                "source": "quiet_hunt",
                "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
            }
            with iso_log.open("a") as f:
                f.write(json.dumps(record) + "\n")
            print(json.dumps(record))
            if record["clean_block"]:
                break  # one fully clean-bracketed sample is the goal
        time.sleep(interval)
    spark.stop()


if __name__ == "__main__":
    main()
