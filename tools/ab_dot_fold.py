#!/usr/bin/env python
"""Same-window A/B of the r13 ``dot()``/``l2_norm()`` index fold vs the
r12 zip_with/transform forms (VERDICT r13 item 3).

The r13 driver run regressed both consumers of the fold (cosine_topk
0.65x, embedding_semantic_dedup 0.80x) while the builder's isolated
record said it was a wash (1.11 -> 0.99).  This script settles it the
only way ambient noise allows: BOTH forms timed in ONE session, trials
interleaved A/B/A/B so host drift lands on both arms equally, min-of-N
per (query, form), jvm-ref stamps before and after.

Forms:
  fold  — r13 HEAD: one aggregate over 1..size(a) with two element_at
          lookups per step (no intermediate array materialized).
  zipw  — r12: aggregate over zip_with(a,b,*) / transform(a,sq)
          (one dim-length array materialized per evaluation).

Both produce bit-identical scores (same left-fold order, same casts) —
this is a pure execution-cost A/B, which is why swapping the module
functions between trials is sound.

Usage: SPARK_GRAFT_CPUS=32 python tools/ab_dot_fold.py [n_trials]
Writes bench_runs/ab_dot_fold.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from dp1_data_wrangling_spark.operators import similarity  # noqa: E402
from dp1_data_wrangling_spark.queries import REGISTRY  # noqa: E402
from dp1_data_wrangling_spark.session import get_spark  # noqa: E402

QUERIES = ["cosine_topk", "embedding_semantic_dedup", "ivf_pq_recall_bound"]


def _index_seq(a):
    """1..size(a) as an int array; [] for empty or NULL input (the r13
    fold form's guard, kept here after the module reverted to zip_with)."""
    return F.when(F.size(a) >= 1, F.sequence(F.lit(1), F.size(a))).otherwise(
        F.expr("cast(array() as array<int>)")
    )


def _fold_dot(a, b):
    folded = F.aggregate(
        _index_seq(a),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double"),
    )
    return F.when(
        a.isNull() | b.isNull(), F.lit(None).cast("double")
    ).otherwise(folded)


def _fold_l2(a):
    folded = F.aggregate(
        _index_seq(a),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(a, i).cast("double") * F.element_at(a, i).cast("double"),
    )
    return F.sqrt(
        F.when(a.isNull(), F.lit(None).cast("double")).otherwise(folded)
    )


def _zipw_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _zipw_l2(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


FORMS = {
    "fold": (_fold_dot, _fold_l2),
    "zipw": (_zipw_dot, _zipw_l2),
}


def main() -> None:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-dot-fold")
    spark.sparkContext.setLogLevel("ERROR")

    from bench import jvm_ref_probe  # noqa: PLC0415

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    # warm-up both arms once (codegen caches for each expression shape)
    for form, (d, l) in FORMS.items():
        similarity.dot, similarity.l2_norm = d, l
        run_once(QUERIES[0])

    probe_before = jvm_ref_probe(spark)
    results: dict[str, dict[str, list[float]]] = {
        q: {f: [] for f in FORMS} for q in QUERIES
    }
    for trial in range(n_trials):
        # alternate which arm goes first so slow drift within a trial
        # pair does not systematically favor one form
        order = list(FORMS) if trial % 2 == 0 else list(reversed(FORMS))
        for q in QUERIES:
            for form in order:
                similarity.dot, similarity.l2_norm = FORMS[form]
                spark.sparkContext.setJobDescription(f"ab {q} {form} t{trial}")
                results[q][form].append(round(run_once(q), 3))
    probe_after = jvm_ref_probe(spark)
    # restore the module's shipped form (zip_with since the r14 revert)
    similarity.dot, similarity.l2_norm = FORMS["zipw"]

    summary = {
        q: {
            "fold_min": min(r["fold"]),
            "zipw_min": min(r["zipw"]),
            "fold_vs_zipw": round(min(r["fold"]) / min(r["zipw"]), 3),
            "samples": r,
        }
        for q, r in results.items()
    }
    record = {
        "n_trials": n_trials,
        "jvm_ref_before": probe_before,
        "jvm_ref_after": probe_after,
        "queries": summary,
    }
    out = Path(__file__).resolve().parents[1] / "bench_runs" / "ab_dot_fold.json"
    out.write_text(json.dumps(record, indent=1) + "\n")
    print(json.dumps({q: {k: v for k, v in s.items() if k != "samples"}
                      for q, s in summary.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
