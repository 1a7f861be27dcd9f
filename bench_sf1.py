"""Two-decade scale spot-run for the heaviest operator cores (round 12,
VERDICT r11 item 5).

Every scaling probe in bench.py measures ONE decade (10x rows at
~50k-row scale); this one-off run adds a second decade — sf1-equivalent
row counts (10x the sf0.1 fixtures: 50k documents, 1.5M orders, 2M
graph nodes, 10M rank rows) — for the eight heaviest headliner cores,
so the linearity story rests on a 100x span instead of a 10x one.

Methodology: the SAME md5/Knuth-deterministic generator laws as the
bench.py probes (vocabulary ∝ corpus for the text ops — the realistic
Zipfian-wide regime; bounded degree 0-3 for the graphs; the mega-tie
adversarial mix for the ntile machinery; a FIXED brand universe with
baskets ∝ corpus for the rules miner, matching the real query's shape
where dimensions hold still as facts grow), three scale points each at
1x / 10x / 100x rows, full-materialization timing (noop sink),
min-of-2 at the top point (a 100x point re-run would double a
multi-minute run for a statistic the two smaller mins already anchor),
min-of-3 below, OUTPUT counts recorded wherever the operator's cost is
output-bound so every ratio is self-explaining.

Writes BENCH_SF1.json (committed, judge-readable) and prints one JSON
line.  Run manually on an idle machine: the machine_ref gate from
bench.py applies — a contended host inflates the top point first.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

from pyspark.sql import functions as F

from dp1_data_wrangling_spark.session import get_spark

JVM_REF_BEST_SEC = 0.059  # keep in lockstep with bench.py


def main() -> None:
    spark = get_spark("dp1-bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def timed(fn, reps: int) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            materialize(fn())
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    def jvm_ref() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(0, 50_000_000, 1, 32).selectExpr(
                "sum(id * 3 + 1) as s"
            ).collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    # r13: core filter + admission gate for targeted clean-window
    # re-measures (VERDICT r12 item 3).  SPARK_GRAFT_SF1_ONLY names a
    # comma-separated core subset; a filtered run writes
    # BENCH_SF1_RERUN.json instead of clobbering the full record.
    import os

    only = {
        s for s in os.environ.get("SPARK_GRAFT_SF1_ONLY", "").split(",") if s
    }
    gate_budget = float(os.environ.get("SPARK_GRAFT_BENCH_GATE_SEC", "0"))
    gate = None
    if gate_budget > 0:
        from bench import wait_for_clean_host

        gate = wait_for_clean_host(spark, gate_budget)

    results: dict[str, dict] = {"machine_ref_jvm_start": jvm_ref()}
    if gate is not None:
        results["gate"] = gate
    tmp = tempfile.mkdtemp(prefix="bench_sf1_")

    def record(name: str, sizes, fn_of_path, gen, count_fn=None, top_reps=2):
        """Generate the three corpora, time the operator at each, record
        counts.  gen(n) -> DataFrame written once per size (generation
        excluded from timing)."""
        if only and name not in only:
            return
        try:
            paths = {}
            for n in sizes:
                paths[n] = f"{tmp}/{name}_{n}"
                gen(n).write.parquet(paths[n])
            secs = []
            for i, n in enumerate(sizes):
                reps = top_reps if i == len(sizes) - 1 else 3
                secs.append(
                    timed(lambda n=n: fn_of_path(paths[n]), reps)
                )
            entry = {
                "n_rows": list(sizes),
                "sec": secs,
                "ratio_decade1": round(secs[1] / secs[0], 2),
                "ratio_decade2": round(secs[2] / secs[1], 2),
            }
            if count_fn is not None:
                entry["out_rows"] = [
                    count_fn(paths[n]) for n in sizes
                ]
            results[name] = entry
            print(f"{name}: {entry}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 - one probe must not
            # lose the whole record
            results[name] = {"error": str(exc)[:200]}
            print(f"{name} failed: {exc}", file=sys.stderr)

    # --- text corpus, vocabulary ∝ corpus (df ~ 60, the realistic
    # regime; every 5th doc is a planted near-dup so pair output ∝ n) --
    def synth_docs_vprop(n: int):
        base = (
            F.when(F.col("id") % 5 == 0, F.col("id") - 1)
            .otherwise(F.col("id"))
            .cast("string")
        )
        word = lambda j: F.substring(  # noqa: E731
            F.md5(
                F.concat_ws(
                    "w",
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat_ws("s", base, j)), 1, 15
                            ),
                            16,
                            10,
                        ).cast("long")
                        % n
                    ).cast("string"),
                )
            ),
            1,
            6,
        )
        words = F.transform(F.sequence(F.lit(0), F.lit(59)), word)
        text = F.when(
            F.col("id") % 5 == 0,
            F.concat(
                F.array_join(F.slice(words, 1, 59), " "),
                F.lit(" zzmutant"),
            ),
        ).otherwise(F.array_join(words, " "))
        return spark.range(n).select(
            F.col("id").alias("doc_id"), text.alias("text")
        )

    from dp1_data_wrangling_spark.operators.dedup import (
        minhash_candidate_pairs,
        simhash_candidate_pairs,
    )

    DOC_SIZES = (5_000, 50_000, 500_000)
    record(
        "minhash_pairs",
        DOC_SIZES,
        lambda p: minhash_candidate_pairs(spark.read.parquet(p)),
        synth_docs_vprop,
        count_fn=lambda p: minhash_candidate_pairs(
            spark.read.parquet(p)
        ).count(),
    )
    record(
        "simhash_pairs_capped",
        DOC_SIZES,
        lambda p: simhash_candidate_pairs(
            spark.read.parquet(p), max_bucket_size=8, two_pass=True
        ),
        synth_docs_vprop,
        count_fn=lambda p: simhash_candidate_pairs(
            spark.read.parquet(p), max_bucket_size=8, two_pass=True
        ).count(),
    )

    # BM25 over the same corpora: fixed query ids hit real vocabulary
    # words at every size (word i exists whenever i < n)
    import hashlib

    from dp1_data_wrangling_spark.operators.retrieval import bm25_topk

    def vw(i: int) -> str:
        return hashlib.md5(str(i).encode()).hexdigest()[:6]

    bm_queries = spark.createDataFrame(
        [
            (1, f"{vw(3)} {vw(77)}"),
            (2, f"{vw(150)} {vw(222)} {vw(431)}"),
            (3, f"{vw(499)}"),
        ],
        ["query_id", "query_text"],
    )
    record(
        "bm25_topk",
        DOC_SIZES,
        lambda p: bm25_topk(spark.read.parquet(p), bm_queries, k=10),
        synth_docs_vprop,
    )

    # --- bounded-degree graphs (0-3 out-edges/node, the bench law) ---
    def synth_graph(n: int):
        deg = (F.col("id") * 2654435761) % 4
        return (
            spark.range(n)
            .select(F.col("id").alias("src"), deg.alias("d"))
            .filter("d > 0")
            .select(
                "src",
                F.explode(
                    F.sequence(F.lit(1).cast("bigint"), F.col("d"))
                ).alias("j"),
            )
            .select(
                "src",
                ((F.col("src") * 40503 + F.col("j") * 69069) % n).alias(
                    "dst"
                ),
            )
        )

    from dp1_data_wrangling_spark.operators.graph import (
        label_propagation,
        link_prediction,
        pagerank,
    )

    GRAPH_SIZES = (20_000, 200_000, 2_000_000)
    # pagerank/LPA need the node frame / rounds too — inline the loop
    try:
        gpaths = {}
        for n in GRAPH_SIZES:
            gpaths[n] = f"{tmp}/graph_{n}"
            synth_graph(n).write.parquet(gpaths[n])
        for name, op in (
            # r13: the inline graph loop honors the SPARK_GRAFT_SF1_ONLY
            # filter like record() does
            (
                "pagerank",
                lambda n: pagerank(
                    spark.range(n).select(F.col("id").alias("node")),
                    spark.read.parquet(gpaths[n]),
                    iterations=5,
                ),
            ),
            (
                "label_propagation",
                lambda n: label_propagation(
                    spark.range(n).select(F.col("id").alias("node")),
                    spark.read.parquet(gpaths[n]),
                    iterations=3,
                ),
            ),
        ):
            if only and name not in only:
                continue
            secs = []
            for i, n in enumerate(GRAPH_SIZES):
                reps = 2 if i == len(GRAPH_SIZES) - 1 else 3
                secs.append(timed(lambda n=n: op(n), reps))
            results[name] = {
                "n_rows": list(GRAPH_SIZES),
                "sec": secs,
                "ratio_decade1": round(secs[1] / secs[0], 2),
                "ratio_decade2": round(secs[2] / secs[1], 2),
            }
            print(f"{name}: {results[name]}", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        results["pagerank"] = {"error": str(exc)[:200]}
        print(f"graph probes failed: {exc}", file=sys.stderr)

    record(
        "link_prediction",
        GRAPH_SIZES,
        lambda p: link_prediction(
            spark.read.parquet(p), min_common=1, max_degree=64
        ),
        synth_graph,
        count_fn=lambda p: link_prediction(
            spark.read.parquet(p), min_common=1, max_degree=64
        ).count(),
    )

    # --- distributed ntile, adversarial mega-tie mix (bench law) ---
    from dp1_data_wrangling_spark.operators.ranking import distributed_ntile

    def synth_rank(n: int):
        return spark.range(n).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 2 == 0, F.lit(7))
            .otherwise((F.col("id") * 2654435761) % (n // 2))
            .cast("bigint")
            .alias("m"),
        )

    record(
        "distributed_ntile",
        (100_000, 1_000_000, 10_000_000),
        lambda p: distributed_ntile(
            spark.read.parquet(p), metric_col="m", tie_cols=["k"],
            n_tiles=10,
        ),
        synth_rank,
    )

    # --- association rules: FIXED 25-brand universe, baskets ∝ corpus
    # (the real query's shape: p_brand cardinality holds still as the
    # lineitem fact grows) — 1-4 distinct items per basket ---
    from dp1_data_wrangling_spark.operators.itemsets import association_rules

    def synth_baskets(n: int):
        k = (F.col("id") * 2654435761) % 4 + 1
        return (
            spark.range(n)
            .select(F.col("id").alias("b"), k.alias("k"))
            .select(
                "b",
                F.explode(
                    F.sequence(F.lit(1).cast("bigint"), F.col("k"))
                ).alias("j"),
            )
            .select(
                "b",
                F.concat(
                    F.lit("brand"),
                    ((F.col("b") * 69069 + F.col("j") * 40503) % 25).cast(
                        "string"
                    ),
                ).alias("i"),
            )
            .distinct()
        )

    record(
        "association_rules",
        (15_000, 150_000, 1_500_000),
        lambda p: association_rules(
            spark.read.parquet(p), basket_col="b", item_col="i",
            min_item_support=5, min_pair_support=5,
            max_items_per_basket=8,
        ),
        synth_baskets,
    )

    results["machine_ref_jvm_end"] = jvm_ref()
    shutil.rmtree(tmp, ignore_errors=True)
    out_name = "BENCH_SF1_RERUN.json" if only else "BENCH_SF1.json"
    Path(__file__).resolve().parent.joinpath(out_name).write_text(
        json.dumps(results, indent=1) + "\n"
    )
    print(json.dumps({"metric": "sf1_spot_run", **{
        k: (v.get("ratio_decade2") if isinstance(v, dict) else v)
        for k, v in results.items()
    }}, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
