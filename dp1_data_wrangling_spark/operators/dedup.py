"""Document deduplication family (BASELINE.json north star; SURVEY.md §7.1.7).

Scale-first design notes (the 100 TB posture):

- **Exact dedup** is a hash-groupBy on a content digest — one shuffle on
  md5(text), map-side combinable.  Never ``dropDuplicates(["text"])`` at
  scale: that shuffles full text payloads; shuffling the 16-byte digest +
  doc id and semi-joining survivors back is ~50x less shuffle volume.
- **MinHash+LSH** shuffles only (band_key, doc_id) pairs — band keys are
  md5 digests, so the shuffle is narrow regardless of document size.
  Candidate generation is an equi-join on band_key; per-bucket fan-out is
  bounded by bucket size, and hot buckets (boilerplate documents) are the
  skew to watch — AQE skew-join or a bucket-size cap handles them.
- **SimHash** reduces each document to one int64; near-dup candidates are
  found by banding the 64 bits into k chunks (exact-match on any chunk ≤
  hamming distance guarantee), again an equi-join on narrow keys.
- All hashes are md5-derived — deterministic across engines and runs (no
  seed, no JVM hashCode), which is what makes the DuckDB oracle able to
  replay the exact pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tables import spread

# MinHash configuration — fixed; the oracle replays these exact constants.
MINHASH_HASHES = 6
MINHASH_BAND_SIZE = 2  # 3 bands of 2 rows
SHINGLE_LEN = 5
NORM_PREFIX = 200  # shingle only the first N chars (bounds cost per doc)


def content_digest(text: Column) -> Column:
    """16-byte exact-dedup key (md5 of raw text)."""
    return F.md5(text.cast("binary"))


def exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry: list[str] | None = None,
) -> DataFrame:
    """Exact dedup: group by content digest, keep the min-id survivor.

    Returns (digest, keep_id, n_copies); join back on digest+id for the
    surviving rows (narrow-shuffle pattern, see module docstring).

    ``carry`` names extra columns to ride along with the survivor via a
    ``min_by(struct(...), id)`` — they come back as columns of the result
    already holding the KEEP row's values, so callers that only need a few
    narrow survivor attributes (e.g. curation's ``n_tokens``) skip the
    join-back entirely and the whole consumer stays single-shuffle at any
    corpus size.  Carry narrow columns only: carried values travel through
    the digest shuffle."""
    carry = carry or []
    rows = docs.select(
        content_digest(F.col(text_col)).alias("digest"),
        F.col(id_col),
        *[F.col(c) for c in carry],
    )
    # one min_by per carried column, NOT min_by(struct(...), id): a struct
    # aggregation buffer knocks the whole groupBy from HashAggregate down
    # to SortAggregate (extra map-side sort of every row)
    aggs = [
        F.min(id_col).alias("keep_id"),
        F.count("*").alias("n_copies"),
        *[F.min_by(F.col(c), F.col(id_col)).alias(c) for c in carry],
    ]
    return rows.groupBy("digest").agg(*aggs)


def normalized(text: Column) -> Column:
    return F.lower(F.substring(text, 1, NORM_PREFIX))


def shingles(norm_col_name: str) -> Column:
    """Character 5-gram shingles of a normalized column (array<string>).
    Documents shorter than the shingle length yield one whole-string
    shingle (greatest(..., 1))."""
    return F.expr(
        f"transform(sequence(1, greatest(length({norm_col_name}) - {SHINGLE_LEN - 1}, 1)), "
        f"j -> substr({norm_col_name}, j, {SHINGLE_LEN}))"
    )


SIG_SLICE = 5  # hex chars per sub-hash sliced from one md5 digest


def minhash_signature(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append minhash signature columns sig_0..sig_{n-1}.

    Each shingle is hashed ONCE (md5 -> 32 hex chars); the hash family is
    the 6 disjoint 5-hex-char slices of that digest, so sig_i = min over
    shingles of digest[i*5 : i*5+5] (lexicographic min over a 20-bit
    sub-hash).  One digest per shingle instead of one per (shingle, i)
    makes signature computation ~6x cheaper — the dominant cost of
    MinHash at scale — with the same banding guarantees.  Pure JVM
    expressions, no Python UDFs.  All 6 minima fold out of the digest
    array in ONE ``aggregate`` pass (r13): the earlier per-signature
    ``transform`` + ``array_min`` materialized 6 sliced string arrays
    per document; the fold keeps a 6-field struct accumulator instead.
    NULL-init ``least`` replays ``array_min``'s skip-NULL semantics
    exactly (least(NULL, x) = x; a NULL-text doc's [NULL] digest array
    still folds to NULL), so results are bit-identical."""
    out = docs.withColumn("__norm", normalized(F.col(text_col))).withColumn(
        "__sh",
        F.expr(
            f"transform(sequence(1, greatest(length(__norm) - {SHINGLE_LEN - 1}, 1)), "
            f"j -> md5(cast(substr(__norm, j, {SHINGLE_LEN}) as binary)))"
        ),
    )
    zero = ", ".join(
        f"'s{i}', cast(NULL as string)" for i in range(MINHASH_HASHES)
    )
    upd = ", ".join(
        f"'s{i}', least(acc.s{i}, substr(h, {i * SIG_SLICE + 1}, {SIG_SLICE}))"
        for i in range(MINHASH_HASHES)
    )
    out = out.withColumn(
        "__mins",
        F.expr(f"aggregate(__sh, named_struct({zero}), (acc, h) -> named_struct({upd}))"),
    )
    for i in range(MINHASH_HASHES):
        out = out.withColumn(f"sig_{i}", F.col(f"__mins.s{i}"))
    return out.drop("__norm", "__sh", "__mins")


def minhash_band_keys(with_sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Explode signatures into (id, band, band_key) rows; band_key is the
    md5 of the band's signature rows — the LSH bucket id."""
    n_bands = MINHASH_HASHES // MINHASH_BAND_SIZE
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"sig_{i}") for i in range(b * MINHASH_BAND_SIZE, (b + 1) * MINHASH_BAND_SIZE)]
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat(*cols).cast("binary")).alias("band_key"),
            )
        )
    return with_sig.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


MAX_BUCKET_SIZE = 100  # default LSH bucket cap (oracle replays this)


def minhash_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_bucket_size: int | None = MAX_BUCKET_SIZE,
    two_pass: bool = False,
) -> DataFrame:
    """Distinct candidate near-dup pairs (id_a < id_b) sharing any LSH band.

    Shape: ONE groupBy((band, band_key)) collecting member ids, then a
    JVM-side i<j pair explosion — no self-join, so the (expensive)
    signature subtree is evaluated exactly once and the only wide inputs
    are 16-byte band keys + ids.  The window-count variant this replaces
    evaluated signatures on both join sides and paid an extra window
    shuffle for the bucket cap; here the cap is a ``size(ids)`` filter on
    the already-aggregated bucket.

    ``max_bucket_size`` drops buckets with more members: an oversized
    bucket means boilerplate/template text that LSH cannot discriminate,
    and enumerating its pairs is quadratic — the classic hot-bucket skew
    (on this corpus, buckets >100 docs are 0.5% of buckets but 73% of raw
    pairs).  Production dedup handles such clusters by connected-component
    labeling on the capped pair graph, not pairwise enumeration.  Pass
    ``None`` to disable.  Truly adversarial corpora — one bucket with
    millions of members — would bloat the collect_set buffer before the
    size filter drops it; ``two_pass=True`` bounds that: count distinct
    members per band key first, semi-join away the hot keys, and only
    then collect (one extra narrow shuffle of 16-byte keys + counts).
    """
    keys = minhash_band_keys(minhash_signature(spread(docs), text_col), id_col)
    return pairs_from_band_keys(
        keys, id_col=id_col, max_bucket_size=max_bucket_size, two_pass=two_pass
    )


def pairs_from_band_keys(
    keys: DataFrame,
    *,
    id_col: str = "doc_id",
    max_bucket_size: int | None = MAX_BUCKET_SIZE,
    two_pass: bool = False,
) -> DataFrame:
    """Candidate pairs from an (id, band, band_key) table — the bucket
    collect + i<j explosion shared by the batch operator and the streaming
    incremental index (streaming/dedup_llm.py).

    ``two_pass=True`` (requires a ``max_bucket_size``) is the
    adversarial-mega-bucket escape hatch: pass 1 counts DISTINCT members
    per (band, band_key) — a map-side-combinable count whose shuffle
    payload is 16-byte keys + longs — and keeps only keys with 2..max
    members; pass 2 semi-joins the key stream against that qualifying set
    BEFORE the collect_set aggregation, so no executor ever buffers a
    degenerate bucket's member list.  Result-identical to the one-pass
    form (the size predicate is the same); costs one extra shuffle, which
    is why it is opt-in rather than the default."""
    if two_pass and max_bucket_size is None:
        # Silent fallback to one-pass with NO cap would buffer the exact
        # mega bucket the flag exists to avoid — reject the combination.
        raise ValueError("two_pass=True requires a max_bucket_size")
    if two_pass:
        # checkpoint BEFORE the branch: the qualifying census and the
        # semi-joined stream both consume `keys`, and without the cut
        # the (expensive) signature subtree executes twice — the CC
        # multi-reference lesson (measured ~1.7x on simhash, r10)
        keys = keys.localCheckpoint(eager=False)
        qualifying = (
            keys.groupBy("band", "band_key")
            .agg(F.countDistinct(id_col).alias("__n"))
            .filter(
                (F.col("__n") >= 2) & (F.col("__n") <= max_bucket_size)
            )
            .select("band", "band_key")
        )
        keys = keys.join(qualifying, ["band", "band_key"], "left_semi")
    # collect_set: duplicate (id, band, band_key) rows — an at-least-once
    # source redelivering a doc within one batch — must not yield (d, d)
    # self-pairs from the i<j explosion.
    buckets = (
        keys.groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_set(id_col)).alias("__ids"))
        .filter(F.size("__ids") >= 2)
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("__ids") <= max_bucket_size)
    pairs = F.expr(
        "flatten(transform(__ids, (x, i) -> "
        "transform(slice(__ids, i + 2, size(__ids)), "
        "y -> struct(x AS id_a, y AS id_b))))"
    )
    return (
        buckets.select(F.explode(pairs).alias("__p"))
        .select(F.col("__p.id_a").alias("id_a"), F.col("__p.id_b").alias("id_b"))
        .distinct()
    )


SIMHASH_BITS = 60


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """60-bit SimHash per document: (id, simhash).

    Each word token's md5 yields a 60-bit hash (15 hex chars); every bit
    votes +1/-1 and the sign vector is the fingerprint.  Computed
    entirely ROW-LOCALLY: a document's tokens already live in one row, so
    the token hashes become one array and the per-bit one-counts fold out
    of it in ONE ``aggregate`` pass — bit b set iff ones > tokens/2
    (identical to the sum-of-±1 votes > 0 form).  The fold's accumulator
    lane-packs the 60 counters as 30 longs x 2 lanes of 32 bits (a count
    never carries across lanes below 2^31 tokens, and a single row cannot
    hold 2^31 word tokens inside Spark's 2 GB string cap), replacing the
    earlier 60 ``size(filter(...))`` array passes per document — 60
    interpreted scans + 60 array allocations per row — with one scan and
    ~4 long ops per (token, lane).  Measured 2.6x on the fingerprint
    stage at sf0.1 (r13); results bit-identical (exact integer counts
    either way).  Zero shuffles and no 100x explode row blowup, and the
    per-row cost is bounded by document length, never corpus size.
    Empty-token docs are dropped, matching the explode form (an exploded
    empty array emits no rows) and the oracle replay."""
    hs = F.expr(
        f"transform(filter(split(lower({text_col}), '\\\\W+'), x -> x != ''), "
        f"t -> cast(conv(substr(md5(cast(t as binary)), 1, 15), 16, 10) as bigint))"
    )
    with_h = (
        spread(docs)
        .select(F.col(id_col), hs.alias("__hs"))
        .where(F.size("__hs") >= 1)
    )
    n_fields = SIMHASH_BITS // 2  # 2 bit-counters per accumulator long
    zero = ", ".join(f"'c{j}', 0L" for j in range(n_fields))
    upd = ", ".join(
        f"'c{j}', acc.c{j} + (shiftright(h, {2 * j}) & 1)"
        f" + shiftleft(shiftright(h, {2 * j + 1}) & 1, 32)"
        for j in range(n_fields)
    )
    counts = F.expr(
        f"aggregate(__hs, named_struct({zero}), "
        f"(acc, h) -> named_struct({upd}))"
    )
    packed = with_h.select(
        F.col(id_col), F.size("__hs").alias("__n"), counts.alias("__c")
    )
    fingerprint = None
    for b in range(SIMHASH_BITS):
        j, lane = divmod(b, 2)
        ones = F.expr(f"shiftright(__c.c{j}, {32 * lane}) & 4294967295")
        bit = F.when(ones * 2 > F.col("__n"), F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return packed.select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_chunks: int = 4,
    *,
    max_bucket_size: int | None = None,
    two_pass: bool = False,
) -> DataFrame:
    """Near-dup candidates: equal 15-bit chunk of the simhash in any of 4
    chunk positions guarantees recall for hamming distance < 4.

    Same shape as ``minhash_candidate_pairs``: ONE groupBy per
    (chunk, value) bucket collecting (id, simhash) members, then a
    JVM-side i<j pair explosion — the (expensive: token explode + 60
    sums) fingerprint subtree is evaluated once, not once per join side.

    ``max_bucket_size`` is the hot-bucket skew valve (default off to keep
    the hamming<4 recall guarantee intact): template-heavy corpora pile
    hundreds of documents onto one chunk value, and a b-member bucket
    emits b² pairs.  Capped buckets trade tail recall for bounded work —
    same contract as the MinHash cap, cluster the survivors with
    connected components.  The round-10 isolated probe adjudicated the
    uncapped scaling reading: 6.35x wall at 10x rows on the 500-word
    synthetic corpus is OUTPUT volume (candidate pairs grow 86.9x there),
    not a hidden all-pairs term — the cap is the knob that restores
    linear wall on template-heavy data.

    ``two_pass=True`` (requires ``max_bucket_size``) is the same
    adversarial-mega-bucket escape hatch as
    ``minhash_candidate_pairs``: pass 1 counts DISTINCT members per
    (chunk, chunk_val) — map-side-combinable, shuffling only 8-byte
    chunk values + longs — and pass 2 semi-joins the key stream against
    the qualifying 2..max set BEFORE the member-collecting aggregation,
    so no executor ever buffers a degenerate bucket's (id, simhash)
    list.  Result-identical to the one-pass capped form."""
    if two_pass and max_bucket_size is None:
        # Mirror pairs_from_band_keys: silently falling back to one-pass
        # with no cap would buffer exactly the mega bucket the flag
        # exists to avoid.
        raise ValueError("two_pass=True requires a max_bucket_size")
    with_h = simhash_fingerprints(docs, text_col, id_col)
    chunk_w = 60 // n_chunks
    # Integer div/mod, never float division: simhash is up to 2^60 and a
    # double round-trip would corrupt high chunks (doubles hold 53 bits).
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.expr(
                    f"(simhash div shiftleft(1L, {c * chunk_w})) "
                    f"% shiftleft(1L, {chunk_w})"
                ).alias("chunk_val"),
            )
            for c in range(n_chunks)
        ]
    )
    keys = with_h.select(id_col, "simhash", F.explode(chunks).alias("ck")).select(
        F.col(id_col).alias("__id"),
        "simhash",
        F.col("ck.chunk").alias("chunk"),
        F.col("ck.chunk_val").alias("chunk_val"),
    )
    if two_pass:
        # checkpoint BEFORE the branch: the qualifying census and the
        # semi-joined stream both consume `keys`, whose 60-bit
        # fingerprint subtree is THE expensive stage — without the cut
        # it executes twice (measured 21s -> 36s on the 50k synth
        # corpus, r10)
        keys = keys.localCheckpoint(eager=False)
        qualifying = (
            keys.groupBy("chunk", "chunk_val")
            .agg(F.countDistinct("__id").alias("__n"))
            .filter((F.col("__n") >= 2) & (F.col("__n") <= max_bucket_size))
            .select("chunk", "chunk_val")
        )
        keys = keys.join(qualifying, ["chunk", "chunk_val"], "left_semi")
    buckets = (
        keys.groupBy("chunk", "chunk_val")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__id"), F.col("simhash")))
            ).alias("__m")
        )
        .filter(F.size("__m") >= 2)
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("__m") <= max_bucket_size)
    pair_expr = F.expr(
        "flatten(transform(__m, (x, i) -> "
        "transform(slice(__m, i + 2, size(__m)), y -> struct("
        "x.__id AS id_a, y.__id AS id_b, "
        "x.simhash AS simhash_a, y.simhash AS simhash_b))))"
    )
    pairs = (
        buckets.select(F.explode(pair_expr).alias("__p"))
        .select("__p.id_a", "__p.id_b", "__p.simhash_a", "__p.simhash_b")
        .distinct()
    )
    # Native popcount of the XOR, NOT an aggregate(sequence(0,59), ...)
    # per-bit loop: higher-order-function lambdas run interpreted (outside
    # whole-stage codegen), and hot buckets make pairs plentiful — the
    # per-bit form cost ~60 interpreted evals x |pairs| (~2.7s of a 4.1s
    # sf0.1 run, measured round 6); bit_count is one JVM instruction-ish
    # expression and mirrors the oracle's bit_count(xor(..)) exactly.
    hamming = F.expr("cast(bit_count(simhash_a ^ simhash_b) as int)")
    return pairs.withColumn("hamming", hamming)


def token_set(text: Column) -> Column:
    """Distinct lowercase word tokens (for Jaccard)."""
    return F.array_distinct(F.filter(F.split(F.lower(text), r"\W+"), lambda x: x != ""))


def jaccard_pairs(
    docs: DataFrame,
    pair_offset: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact token-set Jaccard for the deterministic pair family
    (id, id + pair_offset), computed distributively: explode distinct
    tokens, equi-join on token, count intersections, derive union by
    inclusion-exclusion.  All-integer math until the final division."""
    toks = spread(docs).select(
        F.col(id_col).alias("doc_id"), F.explode(token_set(F.col(text_col))).alias("token")
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    a = toks.withColumnRenamed("doc_id", "doc_id_a")
    b = toks.select(
        (F.col("doc_id") - pair_offset).alias("doc_id_a"), F.col("token"), F.col("doc_id").alias("doc_id_b")
    )
    inter = (
        a.join(b, ["doc_id_a", "token"])
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed("n_tokens", "n_a")
    sb = sizes.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed("n_tokens", "n_b")
    return (
        inter.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            "n_inter",
            "n_a",
            "n_b",
            (
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_freq: int = 1,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level line deduplication (the CCNet/RefinedWeb boilerplate
    screen): drop every line that occurs more than ``max_freq`` times
    ACROSS THE CORPUS — navigation bars, cookie banners, license headers —
    and reassemble each document from its surviving lines in order.

    Four-stage distributed plan, all equi-operations on 16-byte digests:

    1. explode docs into (id, pos, line) — row-local;
    2. line census: one map-side-combinable count per line digest; only
       digests over the threshold survive the HAVING, so the hot-line
       table is boilerplate-sized, tiny next to the corpus;
    3. anti-join lines against hot digests (broadcast when small, shuffle
       of digests otherwise — never the line text);
    4. regroup by document (collect_list + array_sort on the carried
       position — partitioning-independent order), left-joined back to
       the corpus so fully-boilerplate documents survive as empty docs
       with their removal counts.

    The line explode multiplies row count but not bytes (lines partition
    the text); skew is bounded because stage 2 aggregates counts, never
    groups line occurrences.  Returns (id, clean_text, n_lines, n_kept,
    n_removed)."""
    if max_freq < 1:
        raise ValueError(f"max_freq must be >= 1, got {max_freq}")
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(sep), -1)).alias("pos", "line"),
    ).withColumn("_d", F.md5(F.col("line").cast("binary")))
    hot = (
        lines.groupBy("_d")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_freq)
        .select("_d")
    )
    kept = lines.join(hot, "_d", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
    )
    base = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), F.lit(sep), -1)).cast("bigint").alias("n_lines"),
    )
    return (
        base.join(rebuilt, id_col, "left")
        .withColumn("clean_text", F.coalesce("clean_text", F.lit("")))
        .withColumn("n_kept", F.coalesce("n_kept", F.lit(0).cast("bigint")))
        .withColumn("n_removed", (F.col("n_lines") - F.col("n_kept")).cast("bigint"))
    )


def dup_span_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 8,
    max_freq: int = 1,
) -> DataFrame:
    """Substring-level duplication screen: find runs of >= ``n`` tokens
    that appear more than ``max_freq`` times ACROSS THE CORPUS, and
    report per-document how much text sits inside such duplicated spans —
    the deduplicate-training-data diagnostic (Lee et al.'s suffix-array
    substring dedup, re-expressed as token n-gram census + interval
    merge, which a shuffle-based engine can actually run at 100 TB).

    Token n-grams are alignment-free (the same token run yields the same
    grams wherever it sits in a document), so a duplicated region of
    length L >= n produces exactly L - n + 1 matching gram positions;
    merging those positions as [pos, pos + n) intervals recovers the
    span structure: ``dup_tokens`` (union size), ``n_spans`` (maximal
    runs), ``n_hit_grams``.

    Plan: row-local tokenize + gram/position explode -> one combinable
    census on 16-byte gram digests (duplicated-gram table is tiny next
    to the corpus -> the hit semi-join broadcasts) -> one regroup per doc
    where the interval merge is a sorted-array integer fold, never a
    second shuffle.  All outputs integer-exact."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if max_freq < 1:
        raise ValueError(f"max_freq must be >= 1, got {max_freq}")
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\W+"), lambda x: x != ""
        ).alias("_t"),
    ).withColumn("n_tokens", F.size("_t").cast("bigint"))
    eligible = toks.where(F.size("_t") >= n)
    grams = eligible.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, size(_t) - {n}), "
                f"i -> struct(i AS pos, "
                f"md5(array_join(slice(_t, i + 1, {n}), ' ')) AS d))"
            )
        ).alias("_g"),
    ).select(id_col, F.col("_g.pos").alias("pos"), F.col("_g.d").alias("d"))
    hot = (
        grams.groupBy("d")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > max_freq)
        .select("d")
    )
    hits = grams.join(hot, "d", "left_semi")
    merged = hits.groupBy(id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("_ps")
    )
    # interval union of [p, p+n) over sorted starts: each gap contributes
    # min(n, next - cur); the final start contributes n.  Span count =
    # 1 + number of gaps wider than n (a new maximal run starts there).
    merged = merged.select(
        id_col,
        F.size("_ps").cast("bigint").alias("n_hit_grams"),
        F.expr(
            # guard: sequence(0, -1) counts DOWNWARD (the phantom-index
            # trap) — a single-hit doc must skip the gap fold entirely
            f"if(size(_ps) < 2, 0L, aggregate(sequence(0, size(_ps) - 2), 0L, "
            f"(acc, i) -> acc + least(CAST({n} AS BIGINT), "
            f"CAST(_ps[i + 1] - _ps[i] AS BIGINT)))) + {n}"
        ).alias("dup_tokens"),
        F.expr(
            f"1 + if(size(_ps) < 2, 0, size(filter(sequence(0, size(_ps) - 2), "
            f"i -> _ps[i + 1] - _ps[i] > {n})))"
        )
        .cast("bigint")
        .alias("n_spans"),
    )
    return (
        toks.select(id_col, "n_tokens")
        .join(merged, id_col, "left")
        .withColumn("n_hit_grams", F.coalesce("n_hit_grams", F.lit(0).cast("bigint")))
        .withColumn("dup_tokens", F.coalesce("dup_tokens", F.lit(0).cast("bigint")))
        .withColumn("n_spans", F.coalesce("n_spans", F.lit(0).cast("bigint")))
    )


def jaccard_threshold_join(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    t_milli: int = 500,
    max_prefix_df: int | None = None,
) -> DataFrame:
    """EXACT token-set Jaccard similarity self-join: all pairs with
    ``J(a, b) >= t_milli/1000`` — via prefix filtering (the
    AllPairs/PPJoin family, Bayardo et al. WWW'07; public literature),
    never all-pairs.

    Prefix filter: order every record's tokens by GLOBAL rarity
    (document frequency asc, token asc — rare first), and take the
    first ``|s| - ceil(t*|s|) + 1`` as its prefix.  Two sets with
    Jaccard >= t must share a prefix token under any common total order
    (dropping the last ceil(t*|s|)-1 tokens of each cannot erase an
    intersection of >= t*|s| elements), so the prefix-token equi-join
    is COMPLETE; exact verification then computes the true intersection
    row-locally (``array_intersect`` on the two token arrays) and
    applies the threshold cross-multiplied in integers
    (``1000*n_inter >= t_milli*(n_a + n_b - n_inter)``) — no float
    compare anywhere; the reported ``jaccard`` is one exact-integer
    division.

    Scale posture (100 TB): candidates join on the RAREST tokens by
    construction — the frequency ordering is precisely the classic
    skew defense (a stop word lands in a prefix only for a record that
    is nearly all stop words); shuffles move (token, id) pairs and the
    verify stage joins token ARRAYS back by id (payloads move once per
    candidate side, never per token).  Prefix length shrinks as t
    grows — at t=0.9 only ~10% of each record's tokens are join keys.

    ``max_prefix_df`` (r10) is the adversarial-regime valve — the
    PPJoin twin of the MinHash mega-bucket hatch: on a corpus of SHORT
    records over a TINY vocabulary (the documented worst case: every
    prefix token is hot), one stop-word prefix token alone quadratic-
    blows a partition.  When set, prefix tokens whose PREFIX document
    frequency exceeds the cap are semi-pruned BEFORE the candidate
    self-join (a countDistinct per token — map-side combinable 16-byte
    shuffle — then a semi-join; tokens with prefix-df 1 are also
    dropped, a free win since a singleton key cannot form a pair).
    The trade is stated, not silent: a pair whose ONLY shared prefix
    token is capped is lost — duplicates sharing any RARE token are
    still found (rarity ordering puts rare tokens first in every
    prefix), which is why production dedup runs the valve high (e.g.
    1000) to kill only degenerate stop-word keys.  ``None`` (default)
    keeps the exact completeness guarantee.
    """
    if not 1 <= t_milli <= 1000:
        raise ValueError(f"t_milli must be in [1, 1000], got {t_milli}")
    toks = spread(docs).select(
        F.col(id_col).alias("__id"),
        F.explode(token_set(F.col(text_col))).alias("token"),
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("__df"))
    arrs = (
        toks.join(freq, "token")
        .groupBy("__id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(__df, token))),"
                " o -> o.token)"
            ).alias("__toks")
        )
        .withColumn("__n", F.size("__toks").cast("bigint"))
        .withColumn(
            "__p",
            F.col("__n")
            - F.expr(f"({t_milli} * __n + 999) div 1000")
            + F.lit(1),
        )
    )
    prefix = arrs.select(
        "__id", F.explode(F.expr("slice(__toks, 1, __p)")).alias("token")
    )
    if max_prefix_df is not None:
        if max_prefix_df < 2:
            raise ValueError(
                f"max_prefix_df must be >= 2, got {max_prefix_df}"
            )
        # checkpoint BEFORE the branch: the prefix-df census and the
        # semi-joined stream both consume `prefix`, whose rarity-sorted
        # array subtree would otherwise execute twice (the two-pass
        # valve's standing pattern, r10)
        prefix = prefix.localCheckpoint(eager=False)
        qualifying = (
            prefix.groupBy("token")
            .agg(F.countDistinct("__id").alias("__pdf"))
            .filter((F.col("__pdf") >= 2) & (F.col("__pdf") <= max_prefix_df))
            .select("token")
        )
        prefix = prefix.join(qualifying, "token", "left_semi")
    cands = (
        prefix.select(F.col("__id").alias("__ida"), "token")
        .join(prefix.select(F.col("__id").alias("__idb"), "token"), "token")
        .filter(F.col("__ida") < F.col("__idb"))
        .select("__ida", "__idb")
        .distinct()
    )
    a = arrs.select(
        F.col("__id").alias("__ida"),
        F.col("__toks").alias("__ta"),
        F.col("__n").alias("n_a"),
    )
    b = arrs.select(
        F.col("__id").alias("__idb"),
        F.col("__toks").alias("__tb"),
        F.col("__n").alias("n_b"),
    )
    verified = (
        cands.join(a, "__ida")
        .join(b, "__idb")
        .withColumn(
            "n_inter",
            # BIGINT before the cross-multiply: size() is 32-bit and
            # 1000 * n_inter overflows int at ~2.1M tokens (review fix)
            F.expr("CAST(size(array_intersect(__ta, __tb)) AS BIGINT)"),
        )
        .filter(
            F.lit(1000) * F.col("n_inter")
            >= F.lit(t_milli) * (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
    )
    return verified.select(
        F.col("__ida").alias("doc_id_a"),
        F.col("__idb").alias("doc_id_b"),
        F.col("n_inter").cast("bigint"),
        F.col("n_a").cast("bigint"),
        F.col("n_b").cast("bigint"),
        (
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
        ).alias("jaccard"),
    )
