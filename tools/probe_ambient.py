#!/usr/bin/env python
"""One-shot host-ambient probe: the bench.py 32-thread JVM reference
(min-of-3 range-sum) plus the pure-CPU md5 reference, printed as one
JSON line.  Used by the r13 clean-window hunt (VERDICT r12 item 1) to
sample the host WITHOUT paying a full bench run."""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dp1_data_wrangling_spark.session import get_spark  # noqa: E402

JVM_REF_BEST_SEC = 0.059


def main() -> None:
    spark = get_spark("dp1-ambient-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JVM startup / codegen must not pollute the reference
    spark.range(0, 50_000_000, 1, 32).selectExpr("sum(id * 3 + 1) as s").collect()

    def _jvm() -> float:
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 32).selectExpr(
            "sum(id * 3 + 1) as s"
        ).collect()
        return time.perf_counter() - t0

    import hashlib

    def _cpu() -> float:
        h = hashlib.md5()
        blk = b"x" * (1 << 20)
        t0 = time.perf_counter()
        for _ in range(200):
            h.update(blk)
        return time.perf_counter() - t0

    jvm = round(min(_jvm() for _ in range(3)), 3)
    cpu = round(min(_cpu() for _ in range(3)), 3)
    print(
        json.dumps(
            {
                "jvm_range_sum_sec": jvm,
                "cpu_md5_200mb_sec": cpu,
                "ambient_vs_best": round(jvm / JVM_REF_BEST_SEC, 2),
                "machine_clean": jvm <= 0.07,
                "ts": time.strftime("%H:%M:%S"),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
