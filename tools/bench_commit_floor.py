#!/usr/bin/env python
"""Streaming exactly-once commit-floor amortization probe (VERDICT r12
item 5).

Every recorded streaming number so far used 625-12.5k-row micro-batches,
where the ~0.5s atomic-commit floor (manifest read + staged parquet
write + atomic rename + meta update) dominates rows/s.  The claim in
SCALE.md is that the floor AMORTIZES at production batch sizes; this
probe measures it: raw catalog ingest (stream_into_catalog, the same
exactly-once sink every twin rides) at 12.5k / 100k / 1M rows per
micro-batch, 4 batches each, wall-clocked end to end.

Prints one JSON line; append the table to BASELINE.md.  Run on a quiet
host (the floor itself is latency-sensitive — note the machine ref in
the record).
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dp1_data_wrangling_spark.session import get_spark  # noqa: E402
from dp1_data_wrangling_spark.streaming import stream_into_catalog  # noqa: E402

from bench import jvm_ref_probe  # noqa: E402

N_BATCHES = 4


def main() -> None:
    spark = get_spark("dp1-commit-floor")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="commit_floor_")
    out: dict = {"metric": "stream_commit_floor", "n_batches": N_BATCHES}
    out["machine_ref_start"] = jvm_ref_probe(spark)
    try:
        for batch_rows in (12_500, 100_000, 1_000_000):
            src = f"{tmp}/src_{batch_rows}"
            for b in range(N_BATCHES):
                (
                    spark.range(
                        b * batch_rows, (b + 1) * batch_rows, 1, 8
                    )
                    .select(
                        F.col("id").alias("event_id"),
                        (F.col("id") % 1000).alias("user_id"),
                        (F.col("id") * 1_000_000).alias("ts_us"),
                        F.concat(F.lit("type_"), F.col("id") % 7).alias(
                            "event_type"
                        ),
                    )
                    .coalesce(1)
                    .write.parquet(f"{src}/b{b}")
                )
            stream = (
                spark.readStream.schema(
                    "event_id long, user_id long, ts_us long, "
                    "event_type string"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{src}/*/")
            )
            t0 = time.perf_counter()
            stream_into_catalog(
                stream,
                f"{tmp}/cat_{batch_rows}",
                "events_ingest",
                checkpoint_dir=f"{tmp}/ckpt_{batch_rows}",
            ).awaitTermination(600)
            wall = time.perf_counter() - t0
            total = batch_rows * N_BATCHES
            out[f"batch_{batch_rows}"] = {
                "total_rows": total,
                "wall_sec": round(wall, 2),
                "rows_per_sec": int(total / wall),
                "sec_per_batch": round(wall / N_BATCHES, 3),
            }
            print(f"batch {batch_rows}: {out[f'batch_{batch_rows}']}",
                  file=sys.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out["machine_ref_end"] = jvm_ref_probe(spark)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
