"""Generic typed file sources/sinks beyond parquet (CSV / JSON lines / ORC).

The reference ingests parquet + JSON/YAML sidecars (SURVEY.md §2.1 S5-S10);
a general engine also meets raw drops (CSV exports, JSONL event feeds, ORC
from Hive-era pipelines).  Policy, mirroring `tables.load_table`:

- **Schemas are declared, never inferred.**  Inference reads the data
  twice and silently miscasts (every CSV column nullable string on a bad
  row); a 100 TB ingest wants FAILFAST on drift instead.
- **Malformed rows fail the job** (``mode=FAILFAST``) unless the caller
  opts into quarantine, which routes bad rows to a rescue column via
  ``columnNameOfCorruptRecord`` (PERMISSIVE) for later triage — the
  standard dead-letter pattern without a second pass.
- Compression is a write-time knob (zstd default: best scan-cost/size
  tradeoff for columnar ORC; snappy is fine too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    header: bool = True,
    quarantine: bool = False,
    **options: str,
) -> DataFrame:
    """Typed CSV scan; FAILFAST by default, dead-letter column on opt-in."""
    reader = spark.read.options(header=str(header).lower(), **options)
    if quarantine:
        schema = _with_corrupt_col(schema)
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", CORRUPT_COL
        )
    else:
        reader = reader.option("mode", "FAILFAST")
    return reader.schema(schema).csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    quarantine: bool = False,
    **options: str,
) -> DataFrame:
    """Typed JSON-lines scan (one object per line — the splittable form;
    multiline JSON cannot be partitioned and belongs in driver-side
    manifests, not the data plane)."""
    reader = spark.read.options(**options)
    if quarantine:
        schema = _with_corrupt_col(schema)
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", CORRUPT_COL
        )
    else:
        reader = reader.option("mode", "FAILFAST")
    return reader.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Typed ORC scan (self-describing like parquet; the declared schema
    still applies column pruning + fail-fast on drift)."""
    return spark.read.schema(schema).orc(path)


def write_csv(df: DataFrame, path: str, *, header: bool = True, **options: str) -> None:
    df.write.options(header=str(header).lower(), **options).mode("overwrite").csv(path)


def write_jsonl(df: DataFrame, path: str, **options: str) -> None:
    df.write.options(**options).mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str, compression: str = "zstd") -> None:
    df.write.option("compression", compression).mode("overwrite").orc(path)


def quarantined(df: DataFrame) -> DataFrame:
    """The dead-letter rows of a quarantine-mode read.

    The read is cached first: Spark refuses queries that project only the
    corrupt-record column from a raw file scan (the parser would have to
    re-run per query and could disagree with itself) — caching pins one
    parse, which is also what triage wants."""
    return df.cache().filter(F.col(CORRUPT_COL).isNotNull())


def _with_corrupt_col(schema: StructType | str):
    if isinstance(schema, str):
        return f"{schema}, {CORRUPT_COL} string"
    # Copy before extending: StructType.add mutates (and returns) self, so
    # extending the caller's schema object in place would poison their
    # later non-quarantine reads with a phantom _corrupt_record column.
    return StructType(list(schema.fields)).add(CORRUPT_COL, StringType())
