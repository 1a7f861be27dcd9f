"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

Standard training-data hygiene (the screen behind "n-gram overlap with
the eval set" sections of model cards): any train doc sharing at least
one length-n token window with any eval doc is reported with its overlap
count.  Real deployments use n of 8-13; the registered demo query uses
n=4 only because the synthetic fixture vocabulary is tiny.

Scale shape — the asymmetry is the whole design:

- The EVAL side is a benchmark suite (thousands of docs), the TRAIN side
  is the 100 TB corpus.  Eval n-gram digests are therefore distinct-ed
  and **broadcast**; the corpus side stays a scan -> row-local map
  (tokenize, n-grams, md5, per-doc distinct — all inside one project,
  nothing exploded across the wire) -> broadcast-hash semi-probe ->
  ONE map-side-combinable groupBy on doc_id.  No corpus-sized shuffle
  of n-grams ever happens.
- Digests (16-byte md5) rather than raw n-gram strings cross the
  broadcast, and per-doc ``array_distinct`` happens BEFORE the explode,
  so the joined row volume is bounded by matches, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    """lower + non-word split, empties dropped — the corpus_top_ngrams
    tokenization.  DuckDB replay:
    ``list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x != '')``."""
    return F.filter(F.split(F.lower(text), r"\W+"), lambda x: x != "")


def ngram_digests(df: DataFrame, *, n: int, text_col: str = "text") -> DataFrame:
    """Add ``digests`` (per-row DISTINCT md5 of each n-token window) and
    ``n_grams`` (distinct-window count) columns; rows with fewer than n
    tokens drop.  Entirely row-local: tokenize, slide, hash, dedup inside
    one project.  DuckDB replay:
    ``list_distinct(list_transform(range(1, len(t) - n + 2),
    i -> md5(array_to_string(t[i:i+n-1], ' '))))``."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    out = df.withColumn("_t", _tokens(F.col(text_col))).where(
        F.size("_t") >= n
    )
    grams = F.expr(
        f"array_distinct(transform(sequence(1, size(_t) - {n - 1}), "
        f"i -> md5(cast(array_join(slice(_t, i, {n}), ' ') as binary))))"
    )
    return (
        out.withColumn("digests", grams)
        .withColumn("n_grams", F.size("digests").cast("bigint"))
        .drop("_t")
    )


def contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train docs sharing >= 1 n-gram with the eval set:
    ``(id_col, n_grams, n_shared)``, one row per contaminated doc.

    ``n_shared`` counts DISTINCT shared n-grams (per-doc digests are
    pre-distincted); ``n_grams`` is the doc's distinct-window denominator
    for an overlap ratio.  The eval side is distinct-ed then broadcast —
    see the module docstring for why the corpus never shuffles."""
    eval_digests = (
        ngram_digests(eval_docs, n=n, text_col=text_col)
        .select(F.explode("digests").alias("digest"))
        .distinct()
    )
    train_grams = ngram_digests(train, n=n, text_col=text_col).select(
        id_col, "n_grams", F.explode("digests").alias("digest")
    )
    return (
        train_grams.join(F.broadcast(eval_digests), "digest")
        .groupBy(id_col)
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.count("*").alias("n_shared"),
        )
    )


def corpus_ngram_overlap(
    ref: DataFrame,
    cur: DataFrame,
    *,
    n: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-LEVEL n-gram overlap (r12) — the aggregate KPI next to
    :func:`contamination`'s per-doc flags: of all DISTINCT n-grams in
    the current corpus, what share also appears in the reference (and
    the reverse) — the one number a "how much of this scrape is
    already in the training set" decision reads.

        cur_in_ref_ppm = n_shared * 1_000_000 div n_cur_grams
        ref_in_cur_ppm = n_shared * 1_000_000 div n_ref_grams

    exact integers; an empty side reads NULL for its ratio (no grams,
    no share — never a silent 0).

    Returns ONE row: ``(n_ref_grams, n_cur_grams, n_shared,
    cur_in_ref_ppm, ref_in_cur_ppm)``.

    Scale posture (100 TB): per side one row-local digest projection +
    an explode + a distinct (the gram census — the only data-sized
    shuffles); the two censuses full-outer-join on the 32-hex digest
    key and ONE global aggregate folds the three counts (its
    SinglePartition gather is a one-row frame — the documented
    constant-size class).  Overflow: n_shared * 1e6 needs < ~9.2e12
    distinct grams — sample past that (shares are scale-free).
    """
    def grams(df: DataFrame, flag: str) -> DataFrame:
        return (
            ngram_digests(df, n=n, text_col=text_col)
            .select(F.explode("digests").alias("digest"))
            .distinct()
            .withColumn(flag, F.lit(1))
        )

    j = grams(ref, "__r").join(grams(cur, "__c"), "digest", "full_outer")
    agg = j.agg(
        F.count("__r").cast("bigint").alias("n_ref_grams"),
        F.count("__c").cast("bigint").alias("n_cur_grams"),
        F.count(F.when(F.col("__r").isNotNull() & F.col("__c").isNotNull(), 1))
        .cast("bigint")
        .alias("n_shared"),
    )
    return agg.select(
        "n_ref_grams",
        "n_cur_grams",
        "n_shared",
        F.when(
            F.col("n_cur_grams") > 0,
            F.expr("(n_shared * 1000000) div n_cur_grams"),
        ).alias("cur_in_ref_ppm"),
        F.when(
            F.col("n_ref_grams") > 0,
            F.expr("(n_shared * 1000000) div n_ref_grams"),
        ).alias("ref_in_cur_ppm"),
    )
