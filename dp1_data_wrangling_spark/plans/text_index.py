"""Persisted full-text (BM25) index: the postings table as a
term-bucketed catalog artifact.

``operators/retrieval.bm25_topk`` tokenizes the corpus at query time —
one pass over every document per query batch.  At 100 TB the postings
belong on DISK: ``build_text_index`` tokenizes once and publishes the
``(doc_id, term, tf, dl)`` postings hive-partitioned by a term hash
bucket, with the corpus statistics (document count, total token count)
pinned as exact integers in the manifest meta.  ``bm25_query_index``
then reads only the buckets its query terms hash to — Spark's partition
pruning turns the term filter into a directory-level skip, so a query
touches ``|query-term buckets| / n_buckets`` of the postings bytes and
re-tokenizes NOTHING.

Determinism: postings are a pure per-document function of the text, and
the scoring path is byte-identical to the online ``bm25_topk`` (same
rational-cleared tf saturation, same Lucene idf over the same exact
N/S/df integers, same ordered fold) — so an indexed query returns
EXACTLY the online result (equality-tested), and the driver oracle for
the online form verifies the indexed form unchanged.

The term bucket uses Spark's ``xxhash64`` — layout-only (bucket ids
never appear in any result; the query path recomputes them with the
same function), so engine-internal hashing is fine where the value-
facing sketches must use md5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.retrieval import bm25_score_rank, doc_length_postings, tokenize
from ..tables import spread
from .catalog import Catalog

POSTINGS_TABLE = "text/postings"
N_TERM_BUCKETS = 16

META_N_DOCS = "text:n_docs"
META_SUM_DL = "text:sum_dl"
META_BUILD_ID = "text:build_id"


def _term_bucket(col: F.Column) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(N_TERM_BUCKETS)).cast("int")


def doc_postings(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document postings ``(id, term, tf, dl, tb)`` — the shared
    ``doc_length_postings`` construction (the SAME code path the online
    ``bm25_topk`` scores from — they must not drift) plus the layout
    bucket ``tb``.  A pure function of each document's text: postings
    built per micro-batch equal postings built over the whole corpus,
    which is what makes the streaming appender exact."""
    return doc_length_postings(
        docs, text_col=text_col, id_col=id_col
    ).withColumn("tb", _term_bucket(F.col("term")))


def build_text_index(
    spark: SparkSession,
    catalog: Catalog,
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Tokenize the corpus once, publish postings + stats atomically.

    The postings land hive-partitioned by term bucket; documents whose
    text tokenizes to nothing contribute no postings and do not count
    toward ``N`` (matching the online ``bm25_topk`` statistics
    exactly)."""
    postings = doc_postings(
        spread(docs).select(F.col(id_col), F.col(text_col)),
        text_col=text_col,
        id_col=id_col,
    ).localCheckpoint(eager=True)
    [stats] = (
        postings.groupBy()
        .agg(
            F.countDistinct(id_col).alias("n"),
            F.sum("tf").cast("bigint").alias("s"),
        )
        .collect()
    )
    txn = catalog.begin()
    txn.stage(POSTINGS_TABLE, postings, mode="overwrite", partition_by=["tb"])
    catalog.commit(
        txn,
        meta={
            META_N_DOCS: int(stats["n"] or 0),
            META_SUM_DL: int(stats["s"] or 0),
            META_BUILD_ID: txn.txn_id,
        },
    )


def bm25_query_index(
    spark: SparkSession,
    catalog: Catalog,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    max_df_ratio_milli: int = 1000,
) -> DataFrame:
    """Top-``k`` BM25 from the persisted index — byte-identical to
    ``bm25_topk`` over the indexed corpus.

    The query vocabulary (driver-small by contract) becomes a partition-
    pruning bucket filter plus a pushed term filter on the postings
    scan; corpus statistics come from the manifest meta as exact
    integers; document frequencies are counted from the pruned scan
    itself (only query-term postings are read, and df needs exactly
    those rows)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 1 <= max_df_ratio_milli <= 1000:
        raise ValueError(
            f"max_df_ratio_milli must be in [1, 1000], got {max_df_ratio_milli}"
        )
    meta = catalog.meta()
    if META_BUILD_ID not in meta:
        raise RuntimeError(
            "bm25_query_index: no persisted text index — run "
            "build_text_index first"
        )
    n_docs, sum_dl = int(meta[META_N_DOCS]), int(meta[META_SUM_DL])
    qvocab = (
        tokenize(queries, text_col=query_text_col, id_col=query_id_col)
        .distinct()
        .withColumn("tb", _term_bucket(F.col("term")))
        .localCheckpoint(eager=True)
    )
    vocab_rows = qvocab.select("term", "tb").distinct().collect()
    terms = sorted({r["term"] for r in vocab_rows})
    buckets = sorted({int(r["tb"]) for r in vocab_rows})
    # The pruned read feeds two branches (df census + the match) — left
    # UNCHECKPOINTED deliberately: both re-run the bucket-pruned,
    # term-pushed parquet scan, which is cheaper at any scale than
    # materializing the slice, and keeps the pruning visible in the
    # executed plan (gated by test_text_index_query_prunes_partitions).
    postings = (
        catalog.read(spark, POSTINGS_TABLE)
        .where(F.col("tb").isin(buckets) & F.col("term").isin(terms))
        .select(id_col, "term", "tf", "dl")
    )
    dfreq = F.broadcast(
        postings.groupBy("term")
        .agg(F.count("*").alias("df"))
        .join(qvocab.select(query_id_col, "term"), "term")
    )
    matched = postings.join(dfreq, "term").filter(
        F.expr(f"1000 * df <= {max_df_ratio_milli} * {n_docs}")
    )
    return bm25_score_rank(
        matched,
        query_id_col=query_id_col,
        id_col=id_col,
        k=k,
        n_sql=str(n_docs),
        s_sql=str(sum_dl),
    )
