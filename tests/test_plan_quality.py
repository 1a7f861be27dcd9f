"""Physical-plan quality gates (SURVEY.md §4, §7.4.7 — the 100 TB posture).

These tests pin the *plan shape*, not the output: filters reach the
parquet scan, projections prune the read schema, dimension joins
broadcast, and the signature operators shuffle exactly once.  A regression
here is a performance bug that correctness tests cannot see.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from dp1_data_wrangling_spark import fixtures as fx
from dp1_data_wrangling_spark.operators.chains import flatten_chains
from dp1_data_wrangling_spark.operators.find_first import find_first
from dp1_data_wrangling_spark.queries import REGISTRY
from dp1_data_wrangling_spark.tables import load_table

from .conftest import SMOKE_SF


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def data_shuffles(plan: str) -> int:
    """Count data shuffles (hash/range repartitions), excluding broadcast
    exchanges and single-partition gathers."""
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


def test_filter_pushed_to_parquet_scan(spark):
    df = load_table(spark, SMOKE_SF, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_totalprice")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]" in plan


def test_projection_prunes_read_schema(spark):
    df = load_table(spark, SMOKE_SF, "orders").select("o_orderkey", "o_totalprice")
    plan = plan_of(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {"o_orderkey", "o_totalprice"}


def test_find_first_is_single_shuffle(spark):
    """J4: one hash shuffle (min_by agg on data-ID) with map-side partial
    aggregation BEFORE the exchange (one candidate per key per mapper);
    the chain-position map joins as a broadcast, never a shuffle."""
    datasets = fx.build_datasets(spark, SMOKE_SF)
    chain = flatten_chains(
        spark, fx.build_collection_chains(spark), fx.build_collections(spark), "chain_root"
    )
    resolved = find_first(datasets, chain, ["customer", "nation"])
    plan = plan_of(resolved)
    assert data_shuffles(plan) == 1, plan
    assert "BroadcastHashJoin" in plan
    # partial_min_by below the exchange = map-side combine is in effect
    # (struct min_by plans as SortAggregate, not HashAggregate)
    assert plan.index("partial_min_by") > plan.index("Exchange hashpartitioning"), plan


def test_export_plan_broadcasts_all_dimension_joins(spark):
    """The composite export plan: every dimension/chain/tagged join is a
    broadcast hash join.  The ONE sort-merge join is resolved ⋈ datastore
    records on dataset_id — fact×fact, correctly NOT broadcast (and its
    probe side reuses the priority-dedup aggregation's partitioning, so it
    adds only one exchange).  Both top-1 semantics (find-first, priority
    dedup) run as min_by aggregates with map-side partial combine —
    shuffle volume is per-key, not per-row."""
    df = REGISTRY["export_plan"].fn(spark, SMOKE_SF)
    plan = plan_of(df)
    assert plan.count("SortMergeJoin") <= 1, plan
    assert "SortMergeJoin [dataset_id" in plan or "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 6, plan
    assert data_shuffles(plan) <= 5, plan
    assert "ObjectHashAggregate" in plan or "HashAggregate" in plan, plan


def test_exact_dedup_partial_aggregation(spark):
    """A1 at scale: the digest groupBy must partially aggregate map-side
    (HashAggregate before the exchange) and shuffle digests, not payloads."""
    df = REGISTRY["doc_exact_dedup"].fn(spark, SMOKE_SF)
    plan = plan_of(df)
    first_agg = plan.index("HashAggregate")
    first_exchange = plan.index("Exchange")
    assert first_agg < first_exchange, plan
    m = re.search(r"Exchange hashpartitioning\(digest", plan)
    assert m, plan


def test_semi_join_no_extra_shuffle_for_small_side(spark):
    """P5/P6: a semi-join against a dimension-sized id set broadcasts."""
    ds = fx.build_datasets(spark, SMOKE_SF)
    small = ds.select("dataset_id").limit(100)
    out = ds.join(F.broadcast(small), "dataset_id", "left_semi")
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_scalar_queries_have_no_python_in_hot_path(spark):
    """C3-C8 string/path expressions compile to native Catalyst expressions
    (CASE/concat/substr...), never Python eval nodes — the whole-stage
    codegen fast path.  (AQE hides the codegen markers until execution, so
    the assertable invariant is the absence of EvalPython.)"""
    for name in ("path_rewrite", "conditional_rewrite", "pattern_filter"):
        plan = plan_of(REGISTRY[name].fn(spark, SMOKE_SF))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
    # single-stage non-AQE plan shows the codegen span explicitly
    plan = plan_of(REGISTRY["pattern_filter"].fn(spark, SMOKE_SF))
    assert "*(1)" in plan or "WholeStageCodegen" in plan, plan


def test_multi_join_revenue_one_fact_fact_shuffle(spark):
    """Q5 shape: exactly one non-broadcast join (lineitem⋈orders on
    orderkey); customer/nation/region all broadcast; the order-date filter
    is pushed into the parquet scan so the shuffled side is pre-pruned."""
    plan = plan_of(REGISTRY["multi_join_revenue"].fn(spark, SMOKE_SF))
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan, plan


def test_grouping_sets_single_expand_single_shuffle(spark):
    """GROUPING SETS compiles to one Expand + one hash shuffle (partial
    aggregation below the exchange), never one pass per grouping set."""
    plan = plan_of(REGISTRY["grouping_sets_agg"].fn(spark, SMOKE_SF))
    assert plan.count("Expand") == 1, plan
    assert data_shuffles(plan) == 1, plan
    first_agg = plan.index("HashAggregate")
    first_exchange = plan.index("Exchange")
    assert first_agg < first_exchange, plan


def test_bucketed_join_has_zero_exchanges(spark, tmp_path):
    """Storage-layout scale path: datasets and datastore_records written
    bucketed+sorted by dataset_id join with NO exchange and NO sort — the
    fact×fact join the export plan otherwise pays a shuffle for becomes a
    per-bucket local merge."""
    from dp1_data_wrangling_spark.sources.bucketed import bucketed_join, write_bucketed

    ds = fx.build_datasets(spark, SMOKE_SF)
    rec = fx.build_datastore_records(spark, SMOKE_SF).select("dataset_id", "path")
    write_bucketed(
        ds, "t_ds_bucketed", ["dataset_id"], 8,
        sort_cols=["dataset_id"], path=str(tmp_path / "ds"),
    )
    write_bucketed(
        rec, "t_rec_bucketed", ["dataset_id"], 8,
        sort_cols=["dataset_id"], path=str(tmp_path / "rec"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_ds_bucketed", "t_rec_bucketed", ["dataset_id"])
        assert joined.count() == rec.count()
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_ds_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_rec_bucketed")


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """§4: a fact table partitioned on the join key is runtime-pruned by a
    selective dimension filter — the scan's PartitionFilters carries a
    dynamicpruningexpression, so only matching partitions are read.  At
    100 TB this is the difference between scanning one year and the lake."""
    o = load_table(spark, SMOKE_SF, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    o.write.partitionBy("order_year").parquet(str(tmp_path / "fact"))
    o.select("order_year").distinct().withColumn(
        "era", F.col("order_year") % 2
    ).write.parquet(str(tmp_path / "dim"))
    fact = spark.read.parquet(str(tmp_path / "fact"))
    dim = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("era") == 0)
    joined = fact.join(dim, "order_year")
    plan = plan_of(joined)
    assert "dynamicpruningexpression" in plan, plan
    want = o.withColumn("era", F.col("order_year") % 2).filter(F.col("era") == 0)
    assert joined.count() == want.count() > 0


def test_aqe_splits_skewed_join_partition(spark):
    """Skew posture: with AQE skew-join on (engine default), a hot join key
    is split at runtime — the executed plan carries SortMergeJoin(skew=true)
    and a 'skewed' AQEShuffleRead.  Thresholds are lowered so local data
    sizes trigger what 100 TB partitions trigger naturally; restored after."""
    lowered = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in lowered}
    for k, v in lowered.items():
        spark.conf.set(k, v)
    try:
        hot = spark.range(0, 200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        )
        cold = spark.range(0, 900).select(
            (F.col("id") % 9 + 1).alias("k"), F.col("id").alias("v")
        )
        right = spark.range(0, 10).select(
            F.col("id").alias("k"), F.lit("x").alias("tag")
        )
        joined = hot.union(cold).join(right, "k")
        assert len(joined.collect()) == 200_900
        plan = plan_of(joined)
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


def test_topk_compiles_to_take_ordered(spark):
    """O7/top-k: orderBy+limit must become TakeOrderedAndProject, never a
    global sort."""
    plan = plan_of(REGISTRY["sort_topk"].fn(spark, SMOKE_SF))
    assert "TakeOrderedAndProject" in plan, plan


def test_routed_asof_lookup_is_all_hash_joins(spark):
    """J7 routed lookup (the 100 TB as-of path): BOTH branches must plan as
    equi-key hash/sort-merge joins — the bucketized branch on (bucket, keys),
    the unbounded branch on the data-ID keys with the containment predicate
    as a post-filter.  A CartesianProduct or nested-loop join here means the
    equi-keys fell out of the join condition and the plan is quadratic."""
    from dp1_data_wrangling_spark.operators.intervals import routed_lookup

    base = fx.build_datasets_with_key(spark, SMOKE_SF)
    probes = base.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("probe_orderkey"),
        "customer",
        "nation",
        (fx.epoch_ns(F.col("o_orderdate")) + F.lit(43_200_000_000_000)).alias(
            "probe_nsec"
        ),
    )
    calib = fx.build_associations(spark, SMOKE_SF).filter(
        F.col("collection") == "calib_a"
    )
    plan = plan_of(
        routed_lookup(probes, calib, ["customer", "nation"], probe_time="probe_nsec")
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # two join branches, both keyed
    assert len(re.findall(r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)) >= 2, plan


def test_curation_pipeline_single_shuffle_any_scale(spark):
    """doc_curation_pipeline is scan -> map -> ONE digest shuffle -> map at
    any corpus size: n_tokens rides the digest agg as a min_by carry, so
    there is no survivors join-back.  Asserted with broadcast joins
    disabled — at 100 TB the groups side is corpus-sized and nothing can
    broadcast, so the plan must hold with zero broadcast assistance."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = REGISTRY["doc_curation_pipeline"].fn(spark, SMOKE_SF)
        plan = plan_of(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert data_shuffles(plan) == 1, plan
    assert "Join" not in plan, plan
    # the one exchange carries digests, and partial-agg runs map-side first
    assert re.search(r"Exchange hashpartitioning\(digest", plan), plan
    assert plan.index("HashAggregate") < plan.index("Exchange"), plan


def test_priority_dedup_single_shuffle(spark):
    """J5/W2 standalone gate (previously pinned only inside export_plan):
    the min_by form must partially aggregate map-side and shuffle ONCE on
    dataset_id; the priority list joins as a broadcast, never a shuffle."""
    df = REGISTRY["priority_dedup"].fn(spark, SMOKE_SF)
    plan = plan_of(df)
    assert data_shuffles(plan) == 1, plan
    assert re.search(r"Exchange hashpartitioning\(dataset_id", plan), plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    # partial min_by upstream of the exchange (plans print sink-first, so
    # the map-side partial aggregate appears BELOW the Exchange line) = at
    # most one candidate per key per mapper enters the shuffle
    assert plan.index("partial_min_by") > plan.index("Exchange hashpartitioning"), plan


def test_decontamination_corpus_side_never_shuffles_ngrams(spark):
    """Decontamination at 100 TB: the eval side distinct+broadcasts (its
    one hash exchange is benchmark-sized); the corpus side must stay
    scan -> row-local n-gram map -> broadcast probe -> ONE combinable
    groupBy on doc_id.  Total data shuffles <= 2, never a sort-merge
    join, partial agg below the doc_id exchange."""
    from dp1_data_wrangling_spark.queries import REGISTRY as R

    df = R["doc_decontaminate"].fn(spark, SMOKE_SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert data_shuffles(plan) <= 2, plan
    m = re.search(r"Exchange hashpartitioning\(doc_id", plan)
    assert m, plan
    assert plan.index("HashAggregate") < m.start(), plan  # partial agg first


def test_group_topk_no_global_single_partition_window(spark):
    """The sharded two-stage top-k must not degrade to a plan with a
    single-partition global sort; both stages are hash-partitioned
    windows (group+shard, then group)."""
    from dp1_data_wrangling_spark.operators.selection import group_topk

    docs = load_table(spark, SMOKE_SF, "documents").select("doc_id", "source")
    plan = plan_of(group_topk(docs, "source", "doc_id", k=10, salt="g"))
    assert "Exchange SinglePartition" not in plan, plan
    assert len(re.findall(r"RunningWindowFunction|Window", plan)) >= 2, plan
    assert data_shuffles(plan) == 2, plan  # one per window stage


def test_line_dedup_census_has_partial_aggregation(spark):
    """The line census must combine map-side: a billion-occurrence cookie
    banner arrives at the exchange as one partial count per task, never
    as raw occurrences."""
    from dp1_data_wrangling_spark.operators.dedup import line_dedup

    docs = load_table(spark, SMOKE_SF, "documents").select("doc_id", "text")
    plan = plan_of(line_dedup(docs, max_freq=2))
    assert re.search(r"partial_count|partial.*count", plan), plan


def test_dup_span_hot_table_broadcasts(spark):
    """The duplicated-gram table is corpus-duplication-sized (tiny): the
    hit semi-join must broadcast it, never shuffle the gram stream."""
    from dp1_data_wrangling_spark.operators.dedup import dup_span_stats

    docs = load_table(spark, SMOKE_SF, "documents").select("doc_id", "text")
    plan = plan_of(dup_span_stats(docs, n=8))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_top_terms_df_join_broadcasts(spark):
    """The document-frequency table is vocabulary-sized: the score join
    must broadcast it (and the corpus-total is a one-row broadcast)."""
    from dp1_data_wrangling_spark.operators.text import top_terms

    docs = load_table(spark, SMOKE_SF, "documents").select("doc_id", "text")
    plan = plan_of(top_terms(docs, k=3))
    assert plan.count("BroadcastExchange") >= 2, plan
    # the ranking window must partition by the high-cardinality doc id
    # (an empty windowspec partition list would serialize the corpus
    # through one task); the only SinglePartition gather allowed is the
    # one-row corpus total
    assert re.search(r"windowspecdefinition\(doc_id", plan), plan


# Per-query data-shuffle budgets (Exchange hash/range partitioning counts in
# the pre-AQE executed plan at fixture scale).  The DEFAULT budget is the
# engine-wide ceiling; queries listed here have a documented reason to
# exceed it.  A query whose plan grows past its budget fails this gate —
# shuffle regressions become test failures, not code-review hopes.
SHUFFLE_BUDGET_DEFAULT = 4
SHUFFLE_BUDGETS = {
    # association rules: after the checkpointed capped-basket view, the
    # item census, per-basket gather and pair census are each narrow
    # map-side-combinable shuffles over (basket, item) ids; the metric
    # joins broadcast (gate below) — 5 narrow shuffles by design
    "order_brand_rules": 6,
    # recall-bound harnesses run brute-force AND the ANN index, then
    # compare — three operators' shuffles in one plan by design
    "lsh_recall_bound": 8,
    "ivf_recall_bound": 8,
    "ivf_kmeans_recall_bound": 8,
    "ivf_index_recall_bound": 8,
    "pq_recall_bound": 8,
    # IVF-PQ composes two index stages (coarse quantizer assignment +
    # PQ encode) before the recall harness's brute-force comparison
    "ivf_pq_recall_bound": 10,
    # candidate pairs + iterative connected-component label propagation:
    # each CC round is one join shuffle by design (O(log n) rounds total)
    "embedding_semantic_dedup": 8,
    # quality survivors (r12): the digest chain-pair window + the
    # visible CC slice (per-round joins checkpoint away) + the labeled
    # left join + the component-keyed struct-max groupBy + the argmax
    # join back — each a narrow id-/component-keyed shuffle; no window
    # over components (a mega-cluster costs a combiner fold)
    "doc_quality_survivors": 6,
    # Spearman (r13): two value-census groupBys + the census-key
    # midrank window exchange + the two co-keyed (group, value)
    # equi-join shuffles feeding ONE moment aggregate — 5 narrow
    # shuffles by design, none data-sized ungrouped (gate above pins
    # every window to the group key)
    "lineitem_spearman": 5,
    # decile boundary summary (r12): the fact value census + the
    # distributed_rank machinery over it (bucket census, offsets
    # window, final window) + the k-sized tier groupBy — everything
    # after the first groupBy is census-sized
    "orders_decile_summary": 5,
    # degree-ordered triangle counting: canonical distinct + degree agg +
    # wedge self-join + closure join + node count are each narrow int-key
    # shuffles by design (the edge-derivation subtree is checkpointed and
    # runs once; see test_triangle_count_no_cartesian_bounded_shuffles)
    "doc_link_triangles": 10,
    # link prediction (r11): canonical distinct + full-degree census +
    # hub-stripped degree census + w-keyed wedge self-join + pair census
    # + freshness anti-join + two node-keyed degree joins — each a
    # narrow int-key shuffle; the edge/degree subtrees are checkpointed
    # and run once (ledger-pinned at 9)
    "doc_link_prediction": 9,
    # cohort LTV (r11; r12 dropped the distinct-agg expansion for a
    # plain count on the (user, week)-unique input): after the
    # checkpointed first-week census, the (user, week) groupBy, user
    # join, cell census and cohort running-sum window are each narrow
    # user-/census-keyed shuffles — ledger-pinned at 4
    "user_cohort_ltv": 4,
    # Mann-Kendall (r11): after the checkpointed daily census, the
    # key-keyed pair self-join, S groupBy, median window, tie census,
    # duplicate-t check and key-level recombines are each narrow
    # census-space shuffles (pairs are calendar-bounded n² per key,
    # never events²) — ledger-pinned at 6
    "events_trend_test": 6,
    # RxC chi-square (r11): the data-sized census (checkpointed) + two
    # census-sized margin groupBys + grid joins + the final per-group
    # sum — everything after the census moves category-space rows only
    "events_type_hour_independence": 5,
    # Cramér's V (r13) rides the chi2 plan above unchanged (the gate
    # test_cramers_v_rides_chi2_plan pins the exchange counts equal)
    "events_cramers_v": 5,
    # session-scoped funnel (r11): one user-keyed session window + the
    # funnel's session-keyed min-fold joins (one per step) + the 3-row
    # census — all hash-partitioned on the same session key
    "event_session_funnel": 5,
    # BM25: the postings index is checkpointed (built once, 2 shuffles
    # pre-cut); visible shuffles are vocabulary-/stats-sized aggregates
    # (term df over query vocab, query-term dedup x2, corpus-stats doc
    # dedup) + the two real data shuffles (per-(query,doc) fold + rank
    # window) — none move corpus payloads
    "doc_bm25_topk": 8,
    # theta set algebra: every shuffle is SKETCH-space (<= k rows per
    # key survive the checkpointed kmv_sketch) — the sketch build's
    # distinct + bottom-k window, per-key stats, and the pair-keyed
    # count aggregates; all pair joins broadcast (gate below)
    "events_theta_overlap": 11,
    # KMV rollup cube: the base (type, day) sketch build (distinct +
    # bottom-k window, checkpointed once) plus one sketch-space re-min
    # (window + estimate agg) PER rollup level — every post-build
    # shuffle moves <= k 8-byte hashes per cell, never facts
    "events_kmv_cube": 9,
    # RFM (r11): three distributed_ntile passes over the checkpointed
    # customer dimension — each is one dim-keyed census groupBy plus
    # census-SIZED lookup exchanges (value-keyed cumsum join/window) and
    # the (value, tie-bucket) fact window whose exchange the offset join
    # reuses — plus three unique-customer-keyed result joins.  Twelve
    # narrow dim/census shuffles replacing three SINGLE-PARTITION sorts:
    # the trade the r10 verdict asked for (no exchange moves more than
    # the customer dimension, most move censuses)
    "customer_rfm_segments": 12,
    # Lorenz (r11): one distributed_rank(cumsum) pass (census + lookup +
    # fact window/join) + the decile groupBy — same census-shuffle class
    "customer_lorenz_curve": 6,
    # Jaccard-threshold join: token df census + per-record array gather
    # + the prefix equi-join's two sides + candidate distinct + the two
    # id-keyed verify joins — all narrow (token, id) / (id, array)
    # shuffles, never payload-per-token and never all-pairs (gated)
    "doc_jaccard_join": 9,
    # NDCG eval composes the BM25 retrieval plan (8 budget, see
    # doc_bm25_topk) with the graded-relevance label join and the
    # per-query DCG/IDCG aggregates — all query-keyed frames bounded by
    # queries x k, never corpus payloads
    "bm25_ndcg_eval": 12,
    # RRF fusion (r13) composes TWO full rankers — BM25 (8 budget, see
    # doc_bm25_topk) + the coverage ranker (postings census + matched
    # (query,doc) fold + its rank window, all query-term-pruned) — then
    # the fusion itself adds only a <=2k-row union groupBy + per-query
    # window; no exchange moves corpus payloads
    "doc_rrf_fusion": 10,
    # MRR/MAP eval (r13) composes the BM25 retrieval plan (8 budget,
    # see doc_bm25_topk) with the binary-label join, ONE per-query
    # groupBy whose collected array carries every metric as an ordered
    # fold (the retriever subtree executes once — no branch), and the
    # combinable label census for R
    "bm25_mrr_map_eval": 10,
    # degree assortativity (r13): canonical distinct + degree census +
    # two node-keyed equi-joins over the localCheckpointed symmetric
    # edge set + the count-distinct expand in the single moments
    # aggregate — all narrow (node, deg) shuffles; the one-row moments
    # gather is a SinglePartition exchange, not counted
    "doc_link_assortativity": 5,
    # local clustering coefficient (r13): the degree census + the
    # compact-forward triangle pipeline (degree join, wedge self-join,
    # closing join, per-node count — all over the ONE localCheckpointed
    # canonical edge set) + the final node-keyed left join
    "doc_link_clustering": 6,
}


def test_every_registered_query_within_shuffle_budget(spark):
    failures = []
    for name, spec in REGISTRY.items():
        try:
            plan = plan_of(spec.fn(spark, SMOKE_SF))
        except Exception as exc:  # build failure is its own loud signal
            failures.append(f"{name}: plan build failed: {exc}")
            continue
        budget = SHUFFLE_BUDGETS.get(name, SHUFFLE_BUDGET_DEFAULT)
        n = data_shuffles(plan)
        if n > budget:
            failures.append(f"{name}: {n} data shuffles > budget {budget}")
    assert not failures, "\n".join(failures)


def test_semantic_dedup_plan_is_bucketed_never_all_pairs(spark):
    """The SemDeDup candidate stage must be an equi-join on the SRP
    signature — a cartesian pair enumeration would be quadratic at
    corpus scale."""
    from dp1_data_wrangling_spark.operators.semantic import (
        semantic_candidate_pairs,
    )
    from dp1_data_wrangling_spark.queries_llm import _augment_embeddings

    plan = plan_of(
        semantic_candidate_pairs(_augment_embeddings(spark, SMOKE_SF), dim=64)
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "srp_sig" in plan  # the equi-join key is the signature


def test_semantic_decontam_plan_is_bucketed_never_all_pairs(spark):
    """semantic_decontaminate's candidate stage must be an equi-join on
    the SRP signature — corpus × eval enumeration would be quadratic at
    corpus scale — with zero Python in the plan."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(
        REGISTRY["doc_semantic_decontam"].fn(spark, SMOKE_SF)
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "srp_sig" in plan  # the equi-join key is the signature
    assert "BatchEvalPython" not in plan and "EvalPython" not in plan


def test_source_mix_plan_partial_agg_and_broadcast_dimension(spark):
    """source_mix's only data shuffle is the map-side-combinable source
    groupBy; the per-source threshold joins back as a broadcast."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["doc_source_mix"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) <= 1, plan
    assert "partial_sum" in plan  # totals combine map-side
    assert "BroadcastHashJoin" in plan  # threshold dimension broadcasts


def test_quantile_filter_windows_never_partition_on_group_alone(spark):
    """The skew-proof decomposition must not contain a row-level window
    partitioned ONLY by the group column (that is the 40 TB-language
    single-task trap it exists to avoid): group-only windows may run over
    the score HISTOGRAM, and the row-level tie window partitions on
    (group, score)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    df = REGISTRY["doc_quality_quantile"].fn(spark, SMOKE_SF)
    plan = plan_of(df)
    # the tie window's composite (group, score) key is present, and the
    # histogram aggregate combines map-side before its exchange
    assert "milli_ttr" in plan
    # a `partial_count` aggregate = the histogram combines map-side below
    # its exchange (the first Exchange in the string is spread()'s
    # round-robin, so index ordering is not a usable proxy here)
    assert "partial_count" in plan


def test_round7_rowlocal_ops_zero_data_shuffles(spark):
    """The real-decode, audio-frame, and subword-tokenizer queries are
    mapInPandas over the scan: payload/text bytes must never shuffle —
    the plan carries no hash/range exchange at all (only spread()'s
    round-robin on the fixture read), and no row-at-a-time Python."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    for name in ("multimodal_decode", "multimodal_audio_frames",
                 "multimodal_video_frames", "doc_bpe_tokens"):
        plan = plan_of(REGISTRY[name].fn(spark, SMOKE_SF))
        assert data_shuffles(plan) == 0, (name, plan)
        assert "BatchEvalPython" not in plan, name
        assert "MapInPandas" in plan, name
    # the LM score is pure native column expressions — no pandas either
    plan = plan_of(REGISTRY["doc_lm_score"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 0, plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan, plan


def test_multimodal_fused_single_arrow_node(spark):
    """r14 fusion (guide §4): every synthesize->decode chain runs as ONE
    MapInPandas node — the payload bytes cross the Python boundary once,
    not twice.  A second node reappearing means someone recomposed the
    standalone operators in a query path."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    for name in ("multimodal_decode", "multimodal_png", "multimodal_qoi",
                 "multimodal_audio_frames", "multimodal_ulaw",
                 "multimodal_video_frames"):
        plan = plan_of(REGISTRY[name].fn(spark, SMOKE_SF))
        assert plan.count("MapInPandas") == 1, (name, plan)


def test_round8_rowlocal_ops_zero_data_shuffles(spark):
    """Round-8 additions keep the row-local contract: the compressed
    codec queries (PNG, QOI) are mapInPandas over the scan with zero
    data shuffles; the bigram LM score is pure native expressions
    (no pandas, no Python, no shuffle)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    for name in ("multimodal_png", "multimodal_qoi"):
        plan = plan_of(REGISTRY[name].fn(spark, SMOKE_SF))
        assert data_shuffles(plan) == 0, (name, plan)
        assert "BatchEvalPython" not in plan, name
        assert "MapInPandas" in plan, name
    plan = plan_of(REGISTRY["doc_bigram_score"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 0, plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan, plan
    # Gopher quality-rule screen: pure native column expressions, map-only.
    plan = plan_of(REGISTRY["doc_gopher_rules"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 0, plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan, plan


def test_subword_mix_plan_shape(spark):
    """doc_subword_mix: tokenizer (zero-shuffle mapInPandas) -> one
    combinable source-totals aggregate -> join back.  No cartesian, no
    row-at-a-time Python, and the totals aggregate combines map-side."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["doc_subword_mix"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
    assert "MapInPandas" in plan
    assert "partial_sum" in plan  # source totals combine before exchange


def test_pagerank_round_plan_one_contrib_shuffle_no_cartesian(spark):
    """One PageRank round (the repeated unit of cost at 100 TB) must be:
    a src-keyed join of ranks onto edges + ONE fused groupBy-dst
    aggregation that also carries each node's self row (the r13 opt
    shape — no node-keyed recombine join survives) — hash shuffles only,
    with the dangling-mass term entering as a broadcast one-row
    aggregate (never a real cartesian) and map-side partial aggregation
    before the contrib shuffle."""
    from dp1_data_wrangling_spark.operators.graph import (
        _pagerank_round,
        pagerank,  # noqa: F401  (public API sanity: import works)
    )

    nodes = spark.range(100).select(F.col("id").alias("__node"))
    ndeg = nodes.withColumn("__d", (F.col("__node") % 4).cast("bigint"))
    # r13 shape: the edge table is (src, dst) only — the out-degree rides
    # the ranks table, so dangling is a filter+aggregate, not a semi-join
    edges_d = ndeg.filter("__d > 0").select(
        F.col("__node").alias("__src"),
        ((F.col("__node") * 7) % 100).alias("__dst"),
    )
    ranks = ndeg.select(
        "__node", "__d", F.lit(10**10).cast("bigint").alias("pr")
    )
    plan = plan_of(
        _pagerank_round(
            edges_d, ranks, n=100, teleport=15 * 10**8, damping_pct=85
        )
    )
    assert "CartesianProduct" not in plan
    # the one-row dangling aggregate joins via broadcast nested loop —
    # legal ONLY because it is a single row; the data-bearing joins are
    # all equi-joins.  Fused recombine: exactly one data-bearing
    # SortMergeJoin/ShuffledHashJoin may remain (edges x ranks)
    assert plan.count("Exchange hashpartitioning") <= 6
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_ppr_round_same_shape_as_pagerank_round(spark):
    """The personalized round must keep the global round's cost shape:
    the seed flag rides the checkpointed node table (no extra join),
    the dangling one-row aggregate broadcasts, contribs partial-agg."""
    from dp1_data_wrangling_spark.operators.graph import _ppr_round

    nodes = spark.range(100).select(F.col("id").alias("__node"))
    ndeg = nodes.withColumn(
        "__d", (F.col("__node") % 4).cast("bigint")
    ).withColumn("__s", F.col("__node") % 10 == 0)
    # r13 shape: narrow (src, dst) edges; ranks carry (__d, __s)
    edges_d = ndeg.filter("__d > 0").select(
        F.col("__node").alias("__src"),
        ((F.col("__node") * 7) % 100).alias("__dst"),
    )
    ranks = ndeg.select(
        "__node", "__d", "__s", F.lit(10**10).cast("bigint").alias("pr")
    )
    plan = plan_of(
        _ppr_round(
            edges_d, ranks, s=10, seed_tel=15 * 10**9, damping_pct=85
        )
    )
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 6
    assert "partial_sum" in plan


def test_scd2_history_single_shuffle_shared_sort(spark):
    """Both SCD2 windows (change-flag lag, then version/lead) share the
    same partitioning and ordering, so the whole history build must cost
    exactly ONE hash shuffle on the dimension key and reuse the sort."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["user_scd2_history"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 1
    assert plan.count("Sort ") <= 2  # one physical sort, maybe re-listed


def test_funnel_all_joins_on_user_key_no_cartesian(spark):
    """Every funnel step joins on the SAME user key (range predicates
    ride the equi-join as filters), so the plan must be all hash
    equi-joins — no BroadcastNestedLoop/Cartesian from the ts-window
    conditions — with map-side partial min before each fold."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["event_funnel"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "partial_min" in plan


def test_sessionize_single_shuffle_reuses_partitioning(spark):
    """The lag/running-sum window hash-partitions on user_id and the
    per-session groupBy clusters on (user_id, session_idx) — a superset
    of the window's partitioning, so the whole sessionization must cost
    exactly ONE data shuffle (plus map-side partial agg)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["event_sessions"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 1
    assert "partial_min" in plan or "partial_count" in plan


def test_gapfill_no_cartesian_all_equi_joins(spark):
    """Grid->rep is a (key, bucket) hash equi-join and the LOCF window
    partitions on the key — no cartesian/nested-loop anywhere, and the
    per-key grid explode sits behind the span aggregate (partial_min
    combines map-side)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_gapfill"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Generate explode" in plan
    assert "partial_min" in plan


def test_profile_table_approx_mode_has_no_expand(spark):
    """Exact multi-DISTINCT profiling pays the Expand plan (documented);
    the approx mode — the 100 TB path — must profile every column in one
    NON-expanded pass with map-side partial aggregation."""
    from dp1_data_wrangling_spark.operators.profile import profile_table
    from dp1_data_wrangling_spark.tables import load_table

    exact = plan_of(profile_table(load_table(spark, SMOKE_SF, "documents")))
    approx = plan_of(
        profile_table(
            load_table(spark, SMOKE_SF, "documents"), exact_distinct=False
        )
    )
    assert "Expand" in exact  # the documented k+1-way exact plan
    assert "Expand" not in approx
    assert "partial_count" in approx or "partial" in approx
    # the only exchange is the single-partition one-row gather — zero
    # hash/range data shuffles at any input size
    assert data_shuffles(approx) == 0
    assert "Exchange SinglePartition" in approx


def test_linear_trend_two_combinable_shuffles(spark):
    """Hourly-count groupBy + per-type sufficient-statistic groupBy:
    both partial-aggregate map-side, so the whole trend costs exactly
    two hash shuffles whose payload is count/sum cells, never rows."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_hourly_trend"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 2
    assert "partial_count" in plan
    assert "partial_sum" in plan


def test_mad_anomaly_single_window_shuffle(spark):
    """Median and MAD are pure window algebra on ONE group-key
    partitioning: the whole screen costs the hourly groupBy exchange
    plus exactly one window exchange — no joins, no per-group collect
    (the naive stat-join form costs 7 shuffles; this gate pins the
    window rewrite)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_anomalous_hours"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 2
    assert "Join" not in plan


def test_fuzzy_pairs_blocked_never_all_pairs(spark):
    """The fuzzy join is the blocking equi-join + candidate distinct —
    four narrow hash shuffles of (segment-key, id) tuples — with the
    levenshtein verify row-local.  No cartesian/nested-loop product may
    ever appear: that would be the O(n²) form the blocking exists to
    avoid."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    df = REGISTRY["doc_fuzzy_pairs"].fn(spark, SMOKE_SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "levenshtein" in plan  # verify filter stayed JVM-side
    assert data_shuffles(plan) <= 4


def test_ohlc_single_shuffle_window_reused_by_groupby(spark):
    """OHLC is ONE data shuffle: both windows (row_number, count) and
    the final aggregate all partition on (event_type, bucket), so the
    groupBy consumes the window exchange directly — the naive
    first/last-join form costs 3+."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_ohlc"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 1
    assert "Join" not in plan
    assert "partial_max" in plan  # map-side combine on the final agg


def test_triangle_count_no_cartesian_bounded_shuffles(spark):
    """Triangle counting is all narrow int-key equi-joins over the
    checkpointed canonical/oriented edge sets — never a cartesian or
    nested-loop product, and the edge-derivation subtree executes once
    (no SinglePartition re-rank per reference)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    df = REGISTRY["doc_link_triangles"].fn(spark, SMOKE_SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Exchange SinglePartition" not in plan
    assert data_shuffles(plan) <= 10


def test_kmv_distinct_narrow_hash_shuffles(spark):
    """The sketch moves (group, 8-byte hash) pairs: distinct with
    map-side partial agg, then the bottom-k window on the group key —
    never raw values through a shuffle, no cartesian."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_kmv_distinct"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "partial_" in plan  # map-side combine on the distinct/aggs
    assert data_shuffles(plan) <= 4  # hash-distinct, window, 2 agg joins


def test_scd2_enrich_equi_key_carries_hash_join(spark):
    """The fact-to-SCD2 temporal join must hash on user_id with the
    interval containment as a residual filter — never a nested-loop or
    cartesian over facts x versions."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_scd2_enrich"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert re.search(r"Join.*user_id", plan), plan


def test_spatial_pairs_single_cell_equi_join(spark):
    """The spatial join is ONE hash equi-join on the grid cell (anchor +
    9x probe replication) with the exact distance as a residual filter —
    no cartesian/nested-loop, no dedup shuffle (each pair emits once by
    the unique-cell-offset argument)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_spatial_pairs"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert data_shuffles(plan) <= 2  # the two join-side exchanges


def test_cm_sketch_bounded_state_broadcast_probe(spark):
    """The CM build is ONE combinable groupBy to a depth x width matrix;
    the probe join must BROADCAST the (bounded) sketch side — the fact
    stream never shuffles for an estimate."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_cm_heavy_hitters"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan or "partial_count" in plan


def test_ewma_single_window_shuffle_no_join(spark):
    """The EWMA is ONE shuffle (the per-key ordering window); the frame
    fold is row-local JVM expression work — no join, no Python, and the
    rank-range self-join lives only in the oracle."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_ewma"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_knn_cell_equi_join_plus_rank_window(spark):
    """Bounded KNN is the same single grid-cell hash equi-join as the
    distance join plus ONE ranking window keyed on the anchor id —
    never a cartesian/nested-loop."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_knn"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert data_shuffles(plan) <= 3  # two join-side exchanges + rank window


def test_kmv_rolling_sketch_space_only_no_cartesian(spark):
    """The rolling stage must move sketch rows only: the fan-out is a
    row-local explode joined EQUI on (group, anchor bucket) — never a
    cartesian/nested-loop range join — and raw values shuffle exactly
    once (inside the daily-sketch distinct)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_kmv_rolling"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "partial_" in plan  # map-side combine on the distincts


def test_frequent_pairs_broadcast_prune_no_cartesian(spark):
    """The apriori prune must stay broadcast-sized and the pair
    generation row-local — never a cartesian — with both censuses
    combining map-side.  r14 shape: the prune is a ONE-ROW broadcast
    (the frequent vocabulary folded to a sorted array, attached by
    BroadcastNestedLoopJoin with a 1-row build — the same bounded
    pattern as association_rules' basket total), so the gate pins the
    BNLJ count at exactly one instead of forbidding it outright."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["doc_cooccurrence"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "partial_count" in plan


def test_skyline_pure_window_no_join(spark):
    """The 2-D skyline is window algebra only: no join anywhere in the
    plan, no Python, and no single-partition global sort (the query
    groups by shard)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_skyline"].fn(spark, SMOKE_SF))
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert "Exchange SinglePartition" not in plan


def test_sample_quantiles_narrow_windows_no_join(spark):
    """The sample build is one bottom-k window over (group, 8-byte rank)
    rows; the quantile stage windows + aggregates the k-row sketch —
    no join anywhere, map-side combine on the final agg."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_value_quantiles"].fn(spark, SMOKE_SF))
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert "partial_max" in plan


def test_bm25_match_join_is_broadcast_no_python(spark):
    """The inverted-index 'lookup' must be broadcast hash joins (query
    terms are tiny): the postings-to-query match join never sort-merges
    the corpus, everything stays JVM-side, and the checkpointed postings
    index appears as ONE RDD scan feeding the match (the stats/df
    branches read the same materialized index, never re-tokenize)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["doc_bm25_topk"].fn(spark, SMOKE_SF))
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "EvalPython" not in plan, plan


def test_hdr_sketch_cell_space_no_join(spark):
    """HDR quantiles: one map-side-combinable cell groupBy (partial_count
    before the exchange) + windows over CELLS; no join anywhere."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_hdr_quantiles"].fn(spark, SMOKE_SF))
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "partial_count" in plan, plan


def test_hll_sketch_one_combinable_groupby_no_window(spark):
    """HLL is the cheapest distinct shape: the register build is ONE
    map-side-combinable groupBy (partial_max before the exchange) with
    NO window pass and no distinct; the demo query's only other
    shuffles are the estimate agg and the exact-count comparison."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_hll_distinct"].fn(spark, SMOKE_SF))
    assert "Window" not in plan, plan
    assert "partial_max" in plan, plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan, plan
    # registers, estimate agg, exact countDistinct's two-phase pair
    assert data_shuffles(plan) <= 4


def test_geofence_single_cell_equi_join_no_python(spark):
    """Point-in-polygon: ONE hash equi-join on the bbox-grid cell id
    (never points x polygons), the ray cast a row-local JVM fold — no
    cartesian product, no Python, no window."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_geofence"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Window" not in plan, plan


def test_holt_trend_two_shuffles_no_join_no_python(spark):
    """Holt smoothing: the hourly-count groupBy + the per-key series
    gather are the only shuffles; the recurrence is a row-local JVM
    fold (no Python, no join, no window)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_holt_trend"].fn(spark, SMOKE_SF))
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Window" not in plan, plan
    assert data_shuffles(plan) <= 2, plan


def test_entity_resolution_blocked_never_all_pairs(spark):
    """ER composition: candidate generation is the PassJoin segment
    blocking (hash equi-joins only) and clustering runs over the
    checkpointed pair set — no cartesian product, no Python anywhere."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["customer_entity_resolution"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_equi_depth_bins_single_window_shuffle(spark):
    """Per-segment binning: ONE window shuffle on the group key, no
    join, no Python, never a single-partition gather (the grouped form
    is the fact-scale contract)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_value_bins"].fn(spark, SMOKE_SF))
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert data_shuffles(plan) == 1, plan


def test_jaccard_join_prefix_blocked_never_all_pairs(spark):
    """The Jaccard-threshold join generates candidates ONLY through the
    rarity-ordered prefix-token equi-join — no cartesian product, no
    Python; verification is row-local array_intersect."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["doc_jaccard_join"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_weighted_quantiles_single_window_shuffle(spark):
    """Weighted quantiles: ONE group-key window exchange shared by the
    running/total sums and the final groupBy — no join, no Python."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["lineitem_weighted_quantiles"].fn(spark, SMOKE_SF))
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert data_shuffles(plan) == 1, plan


def test_hll_rolling_cell_space_combinable(spark):
    """HLL rolling: the re-max groupBy is map-side combinable over
    CELLS (partial_max below its exchange); no join, no cartesian —
    cheaper than the KMV twin (no dedup/rank windows on hashes)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_hll_rolling"].fn(spark, SMOKE_SF))
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "partial_max" in plan, plan
    assert data_shuffles(plan) <= 3, plan  # daily regs, re-max, estimate


def test_corr_matrix_single_combinable_aggregate(spark):
    """The whole correlation matrix is ONE combinable groupBy (partial
    aggregation below the single exchange) — the pair explosion runs on
    aggregate rows, so no join, no window, no second data pass."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["lineitem_corr_matrix"].fn(spark, SMOKE_SF))
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert data_shuffles(plan) == 1, plan
    assert "partial_" in plan, plan


def test_decay_attribution_user_equi_join_no_cartesian(spark):
    """Time-decay attribution: conversions x touches is ONE user-keyed
    hash equi-join; every window partitions on conv_id; weights are
    row-local shifts — no cartesian, no Python."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["event_attribution_decay"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_expectation_suite_single_pass_no_join(spark):
    """The whole rule suite is one wide aggregate: no join, no window,
    no Python; map-side combine reduces each partition to one row."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["table_expectations"].fn(spark, SMOKE_SF))
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_theta_overlap_sketch_space_all_broadcast(spark):
    """Theta set algebra runs downstream of the checkpointed bottom-k
    sketch: the pair frame and every per-pair count join broadcast (no
    sort-merge join anywhere), nothing evaluates Python, and no
    cartesian product sneaks in (the key-pair inequality join is a
    broadcast nested loop over the dimension-sized theta table)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_theta_overlap"].fn(spark, SMOKE_SF))
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_phrase_search_broadcast_postings_join_no_python(spark):
    """The phrase-token join must broadcast (the phrase table is tiny),
    the anchor conjunction must partially aggregate map-side, and
    nothing evaluates Python."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["doc_phrase_search"].fn(spark, SMOKE_SF))
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "EvalPython" not in plan, plan
    assert "partial_count" in plan, plan


def test_cusum_single_exchange_no_join_no_python(spark):
    """CUSUM: the group constants, both cumulative sums and both running
    mins all share ONE hash partitioning — a single data exchange,
    stacked sorts, no join, no Python anywhere."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_changepoints"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) <= 2, plan  # AQE prints initial+final
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_mmr_rerank_row_local_no_python_one_shuffle(spark):
    """MMR: the greedy k-step selection is row-local JVM higher-order
    algebra — exactly ONE data shuffle (the per-query pool gather); the
    only nested-loop join is the documented brute-force first stage
    (broadcast probes x corpus); no Python anywhere."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["embedding_mmr_rerank"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) <= 2, plan  # AQE prints initial+final
    assert "EvalPython" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


def test_interpolate_keyed_stages_no_python(spark):
    """Linear interpolation: every stage keys on (key, bucket) or key —
    no cartesian, no Python; prev/next neighbor frames share one sort."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_interpolate"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert data_shuffles(plan) <= 4, plan


def test_kcore_no_cartesian_no_python(spark):
    """k-core peeling: every round is a degree aggregate + anti-joins on
    int keys over the checkpointed shrinking edge set — no cartesian,
    no Python in the final plan."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["doc_link_kcore"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_abc_classes_partial_agg_no_single_partition(spark):
    """ABC (r11): the fact-table revenue groupBy partial-aggregates
    map-side (shuffle carries per-part partials, never lineitem rows);
    the ranking is the census-decomposed distributed_rank — NO
    single-partition exchange anywhere in the executed plan (the r10
    verdict's item 1).  No Python anywhere."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["part_abc_classes"].fn(spark, SMOKE_SF))
    assert "EvalPython" not in plan, plan
    # map-side combine: partial_sum sits below the hash exchange (the
    # plan string is top-down, so assert the node kinds, not indexes)
    assert "partial_sum" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the scan reads only the three needed columns
    assert "ReadSchema: struct<l_partkey:bigint,l_extendedprice:double,l_discount:double>" in plan, plan


def test_attribution_user_keyed_join_no_python(spark):
    """Attribution: one user-keyed equi-join (the time window is a
    post-join filter, never a cartesian) + per-conversion windows; no
    Python."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["event_attribution"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "EvalPython" not in plan, plan


# ---------------------------------------------------------------------------
# Exchange-count ledger (r10): the committed shuffle budget for the ten
# most expensive bench headliners, measured at sf0.1 (broadcast-vs-
# shuffle choices are size-estimate-dependent, so the ledger is pinned
# at the SF the bench runs at).  The same table is committed in
# SCALE.md; test_exchange_ledger_matches_scale_md keeps the two from
# drifting.  Caveats encoded in the numbers: localCheckpoint hides
# upstream subtrees (doc_link_pagerank shows its final-round slice — 0
# visible data exchanges; the per-round budget is gated separately in
# test_pagerank_one_shuffle_per_round-style gates), and counts are of
# the UNEXECUTED plan, so AQE's Final/Initial double-print trap never
# applies.
# ---------------------------------------------------------------------------

EXCHANGE_LEDGER = {
    # name: (data shuffles, broadcast exchanges, single-partition gathers)
    # r11: extended from the top-10 to EVERY bench headliner —
    # the cheapest drift alarm the plan tier has.  events_ks_drift's
    # six single-partition gathers are the documented n_bins-row
    # spine windows (metadata-sized BY DESIGN); order_brand_rules'
    # and doc_bm25_topk's one each are one-row total aggregates.
    "certify_probe": (1, 0, 0),
    "cosine_topk": (1, 1, 0),
    "dedup_clusters": (0, 1, 0),
    "dimension_expansion": (0, 4, 0),
    # r13: corpus stats fold from row-local token counts (zero-shuffle
    # one-row aggregate) and the query-vocab semi-join moved BEFORE the
    # (doc, term) tf groupBy — the full-corpus postings shuffle, its
    # doc-length window and the eager postings checkpoint are gone; the
    # six remaining data exchanges all carry query-term-sized rows (the
    # two query-vocab distincts, tf groupBy, df window, fold, rank)
    "doc_bm25_topk": (6, 3, 1),
    "doc_bpe_tokens": (0, 0, 0),
    "doc_curation_pipeline": (1, 0, 0),
    "doc_exact_dedup": (1, 0, 0),
    # r13: probe substrings dedup row-locally (array_distinct before the
    # explode) — the probe-side global distinct and its corpus-sized
    # exchange are gone (2 -> 1)
    "doc_fuzzy_pairs": (1, 1, 0),
    "doc_global_shuffle": (1, 0, 0),
    "doc_line_dedup": (2, 2, 0),
    "doc_link_communities": (0, 0, 0),
    "doc_link_pagerank": (0, 0, 0),
    # doc_link_prediction's visible slice starts at its lazy-checkpointed
    # edge/degree sets (like pagerank's final round): pair census,
    # freshness anti-join and two degree joins — r13 keyed the adjacency
    # checkpoint on the wedge pivot, so the self-join itself plans with
    # ZERO exchanges (9 -> 8)
    "doc_link_prediction": (8, 0, 0),
    # events_diff_in_diff: ONE combinable groupBy, no window, no join
    "events_diff_in_diff": (1, 0, 0),
    # orders_benford: ONE combinable pivot census groupBy; the grid
    # rebuild is a row-local explode and the chi2 window repartitions
    # the nine-rows-per-group census on the group key
    "orders_benford": (2, 0, 0),
    # events_trend_test: visible slice from the lazily-checkpointed
    # daily census — the key-keyed pair self-join, S groupBy, median
    # window, tie census and duplicate-t check plus the key-level
    # recombine joins (broadcasts are the key-sized stat frames)
    "events_trend_test": (6, 3, 0),
    # user_cohort_ltv: visible slice from the lazily-checkpointed
    # first-week census — (user, week) groupBy, user join, single-phase
    # cell census (r12: plain count on the unique input), cohort
    # running-sum window; broadcasts are the firsts side + the
    # weeks-sized cohort sizes
    "user_cohort_ltv": (4, 2, 0),
    # events_rank_sum: the value census is the one event-sized
    # shuffle; the midrank window shuffles on the group key and the
    # final groupBy reuses that partitioning — no join anywhere
    "events_rank_sum": (2, 0, 0),
    # events_seasonal_profile: one combinable census groupBy; the
    # key-total recombine broadcasts census-sized rows back
    "events_seasonal_profile": (1, 1, 0),
    # event_attribution_position: one user-keyed equi-join (broadcast
    # conv side at this sf) + per-conversion windows on the same key
    "event_attribution_position": (1, 1, 0),
    # events_stickiness: the checkpointed (user, day) census distinct +
    # dau groupBy + served-days distinct/mau groupBy (census-sized);
    # the single-partition gather is the one-row max-day cap
    "events_stickiness": (3, 2, 1),
    # events_throttle: ONE (user,type)-keyed window exchange reused by
    # the gap flags, the burst windows and the keep rule
    "events_throttle": (1, 0, 0),
    # event_session_funnel: visible slice from the lazily-checkpointed
    # sessionized stream (r13 — the window chain previously executed
    # once per funnel step): the funnel's session-keyed min-fold joins
    # + the 3-row census groupBy
    "event_session_funnel": (2, 2, 0),
    # events_type_hour_independence: the lazily-checkpointed census is
    # the one data-sized shuffle; margins/total/grid run over census
    # rows (two census groupBys + the grid joins; broadcasts are the
    # census-sized margin/total sides)
    "events_type_hour_independence": (5, 3, 0),
    "doc_link_triangles": (5, 0, 0),
    "embedding_semantic_dedup": (2, 0, 0),
    "event_conversion_paths": (2, 1, 0),
    "event_funnel": (1, 2, 0),
    "event_sessions": (1, 0, 0),
    "events_acf": (1, 0, 0),
    "events_geofence": (0, 1, 0),
    "events_hdr_quantiles": (2, 0, 0),
    "events_holt_trend": (2, 0, 0),
    "events_ks_drift": (3, 7, 6),
    "events_spatial_pairs": (0, 1, 0),
    "export_plan": (4, 7, 0),
    "find_first": (1, 2, 0),
    "minhash_pairs": (2, 0, 0),
    "multi_join_revenue": (2, 4, 0),
    "multimodal_decode": (0, 0, 0),
    "multimodal_png": (0, 0, 0),
    # r13: the cap window + countDistinct total are gone (single
    # slice(array_sort(collect_list)) aggregate + plain count over the
    # lazily-checkpointed capped arrays) — the one data shuffle left in
    # the visible slice is the pair census
    "order_brand_rules": (1, 3, 1),
    "orders_value_deciles": (3, 2, 0),
    "priority_dedup": (1, 2, 0),
    "session_window": (1, 0, 0),
    "simhash_pairs": (2, 0, 0),
    # user_churn_survival's single-partition gather is the one-row
    # study-end max (metadata-sized by design, broadcast right back)
    "user_churn_survival": (3, 1, 1),
    "user_scd2_history": (1, 0, 0),
}

BENCH_SF = "/root/testdata/sf0.1"


@pytest.mark.parametrize("name", sorted(EXCHANGE_LEDGER))
def test_exchange_ledger_stable(spark, name):
    """The committed exchange budget for each top-10 headliner holds at
    sf0.1: a regression that adds a shuffle (or silently demotes a
    broadcast to a shuffle join) fails here before it costs wall time
    at scale."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY[name].fn(spark, BENCH_SF))
    got = (
        data_shuffles(plan),
        plan.count("BroadcastExchange"),
        len(re.findall(r"Exchange SinglePartition", plan)),
    )
    assert got == EXCHANGE_LEDGER[name], (
        f"{name}: exchange budget drifted — ledger "
        f"{EXCHANGE_LEDGER[name]}, plan {got}; update BOTH this ledger "
        f"and the SCALE.md table if the change is intentional"
    )


def test_exchange_ledger_matches_scale_md(spark):
    """SCALE.md's committed ledger table is generated from
    EXCHANGE_LEDGER — every row's numbers must match, so the doc cannot
    drift from the gate."""
    from pathlib import Path

    text = Path(__file__).resolve().parent.parent.joinpath("SCALE.md").read_text()
    for name, (d, b, s) in EXCHANGE_LEDGER.items():
        row = f"| {name} | {d} | {b} | {s} |"
        assert row in text, f"SCALE.md ledger row missing/stale: {row!r}"


def test_acf_single_exchange(spark):
    """ACF: group constants, all lag lead() frames and the final
    groupBy share ONE hash exchange on the group key; no Python."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_acf"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 1, plan
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_label_propagation_no_cartesian_no_python(spark):
    """LPA: node-keyed equi-joins + combinable counts only; the
    neighbor list and per-round labels are checkpointed (the CC
    lesson), so the visible plan is the last round's slice."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["doc_link_communities"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_association_rules_broadcast_censuses_no_cartesian(spark):
    """Association rules: the item census joins broadcast (vocabulary-
    sized), the basket total is a broadcast one-row aggregate, the pair
    explosion is row-local on the capped basket arrays; no Python."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["order_brand_rules"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan
    # both census joins and the one-row total ride broadcasts
    assert plan.count("BroadcastExchange") >= 3, plan


def test_binned_ks_drift_two_censuses_only(spark):
    """KS drift: the only data-sized work is the two map-side-
    combinable bin censuses; everything after runs on the n_bins-row
    spine with broadcast one-row stats; no Python, no cartesian."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_ks_drift"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert data_shuffles(plan) <= 4, plan
    assert "partial_count" in plan, plan  # censuses combine map-side


def test_conversion_paths_user_join_rowlocal_assembly(spark):
    """Conversion paths: one user-keyed equi-join, per-conversion path
    assembly is a row-local sorted-array slice, census combines
    map-side; no cartesian, no Python."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["event_conversion_paths"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "partial_count" in plan, plan


def test_quantile_normalize_broadcast_ref_join(spark):
    """Quantile normalization: the per-group ranking is ONE group-keyed
    window shuffle; the reference ranking is census-decomposed
    distributed_rank (r12 — the dimension-sized-reference contract is
    retired, so NO SinglePartition exchange anywhere); the rank join
    against the reference broadcasts by default; no Python."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_quantile_normalize"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_decile_summary_census_decomposed(spark):
    """orders_decile_summary (r12): the boundary summary rides
    distributed_rank over the value census — no single-partition
    exchange, no cartesian, no Python; the tier explosion is bounded
    (sequence(t_lo, t_hi) <= k per census row)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["orders_decile_summary"].fn(spark, SMOKE_SF))
    assert "Exchange SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_winsorize_single_exchange(spark):
    """Winsorize: the rank window, group count, both bound selections
    and the projection share ONE group-keyed hash exchange (the NULL
    branch union adds none); no Python."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_winsorize"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 1, plan
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_rfm_segments_fact_collapse_then_distributed_ntile(spark):
    """RFM (r11): one map-side-combinable groupBy collapses facts to
    customer aggregates (lazily checkpointed, so the FINAL plan reads
    the materialized dimension — the fact subtree is gated on the
    un-checkpointed aggregate below); the three ntile tiers are
    census-decomposed distributed_ntile — NO single-partition exchange
    in the executed plan (the r10 verdict's item 1).  No Python, no
    cartesian."""
    from dp1_data_wrangling_spark.registry import REGISTRY
    from dp1_data_wrangling_spark.tables import load_table

    plan = plan_of(REGISTRY["customer_rfm_segments"].fn(spark, SMOKE_SF))
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    # the checkpoint hides the fact groupBy from the final plan (round-9
    # recipe: gate the un-checkpointed subtree directly) — same shape
    # the operator builds before the checkpoint
    agg_plan = plan_of(
        load_table(spark, SMOKE_SF, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"), F.max("o_orderdate").alias("mx"))
    )
    assert "partial_count" in agg_plan or "partial_max" in agg_plan, agg_plan


def test_gini_single_exchange(spark):
    """Gini: the rank window, group constants and the final groupBy
    stack on ONE group-keyed hash exchange; no Python."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["orders_gini_concentration"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 1, plan
    assert "EvalPython" not in plan, plan


def test_orders_value_deciles_no_single_partition(spark):
    """Fact-scale ranking (r11): the decile + percent-rank query runs
    the census-decomposed distributed_rank — NO single-partition
    exchange in the executed plan (the naive NTILE window would gather
    every order into one task); no Python, no cartesian."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["orders_value_deciles"].fn(spark, SMOKE_SF))
    assert "Exchange SinglePartition" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_item_affinity_broadcast_censuses_no_cartesian(spark):
    """Item affinity (r11): same plan class as the association rules —
    broadcast vocabulary censuses, row-local capped pair explosion; no
    Python, no cartesian."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["order_item_affinity"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("BroadcastExchange") >= 2, plan


def test_seasonal_mase_single_exchange(spark):
    """Seasonal MASE (r11): the group constants, both lag frames and
    the final groupBy stack on ONE hash exchange on the series key; no
    Python, no cartesian."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_seasonal_mase"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 1, plan
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_lorenz_curve_no_single_partition(spark):
    """Lorenz curve (r11): the cumulative-share ranking rides the
    census-decomposed distributed_rank — NO single-partition exchange;
    no Python, no cartesian."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["customer_lorenz_curve"].fn(spark, SMOKE_SF))
    assert "Exchange SinglePartition" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ab_experiment_combinable_no_window_no_join(spark):
    """A/B readout (r11): two stacked combinable groupBys (per-user
    outcome, per-segment cells) and scalar algebra after — no window,
    no join, no Python."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_ab_experiment"].fn(spark, SMOKE_SF))
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert data_shuffles(plan) == 2, plan


def test_grid_hotspots_stencil_on_census(spark):
    """Grid hotspots (r11): the 9-offset stencil explodes the CENSUS,
    never the points — the plan's only data-sized exchange is the cell
    census groupBy; the neighbor aggregation and the final equi-join
    run on aggregate-sized frames.  No Python, no cartesian."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_grid_hotspots"].fn(spark, SMOKE_SF))
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # census + neighbor-sum + join key exchanges: all cell-keyed
    assert data_shuffles(plan) <= 3, plan


def test_km_survival_census_fold_no_python(spark):
    """KM survival: subjects reduce to a (cohort, day) census before the
    fold — the per-group aggregate folds CENSUS rows (bounded by the
    observation window), never a subject-sized window; no Python, no
    cartesian, and the only single-partition gather is the one-row
    study-end max."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["user_churn_survival"].fn(spark, SMOKE_SF))
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert len(re.findall(r"Exchange SinglePartition", plan)) == 1, plan
    # the fold itself is a hash aggregate over the census, not a window
    assert "Window" not in plan, plan


def test_link_prediction_blocked_no_cartesian_no_python(spark):
    """Link prediction: candidates are blocked per intermediate node
    (w-keyed equi-join over the adjacency), never all-pairs; no Python;
    the hub valve and degree joins are node-keyed."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["doc_link_prediction"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_diff_in_diff_one_groupby_no_window_no_join(spark):
    """DiD: four conditional sums + four conditional counts in ONE
    map-side-combinable groupBy; everything after is per-group scalar
    algebra — no window, no join, no Python."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_diff_in_diff"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 1, plan
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_contingency_chi2_census_decomposed_no_python(spark):
    """RxC chi-square: one data-sized census groupBy (checkpointed for
    its four consumers); margins, grid cross and cell terms run over
    census rows — no cartesian, no Python."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(
        REGISTRY["events_type_hour_independence"].fn(spark, SMOKE_SF)
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_seasonal_profile_census_only_no_window(spark):
    """Seasonal profile: one combinable census groupBy is the only
    data-sized shuffle; the recombine is census-sized; no window, no
    Python."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_seasonal_profile"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) <= 2, plan
    assert "Window" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


# ---------------------------------------------------------------------------
# Round-13 governance/eval tier plan gates
# ---------------------------------------------------------------------------


def test_k_anonymity_two_shuffles_no_single_partition(spark):
    """The privacy census is ONE combinable groupBy; count_distinct adds
    the standard two-phase expand — 2 data shuffles total, zero joins,
    zero single-partition gathers at any scale."""
    plan = plan_of(REGISTRY["customer_k_anonymity"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 2, plan
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" not in plan


def test_fk_orphans_broadcast_anti_joins(spark):
    """Each relation's orphan check is a broadcast left-anti join on the
    DISTINCT dimension key set (dimension-key-sized build side); the six
    single-partition gathers are the per-relation one-row count frames
    (metadata-sized by design).  No cartesian, no sort-merge explosion."""
    plan = plan_of(REGISTRY["warehouse_fk_orphans"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan
    assert plan.count("LeftAnti, BuildRight") == 3, plan
    assert plan.count("Exchange SinglePartition") == 6, plan


def test_heaps_law_single_census_pass(spark):
    """vocab_growth reads the corpus ONCE: one (term, band) census
    shuffle; the per-band fold is a combinable global aggregate (map
    side reduces each partition to one row before the one-row gather)
    and the growth window runs on the bands-sized spine."""
    plan = plan_of(REGISTRY["corpus_heaps_law"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 1, plan
    assert "CartesianProduct" not in plan
    # one corpus scan only — the census fold must not re-read parquet
    assert plan.count("Scan parquet") <= 2, plan  # tokens + n_docs branches


def test_roc_curve_census_then_group_keyed_windows(spark):
    """The ROC fold is the rank_sum contract: one event-sized census
    groupBy, then group-keyed windows over census-sized data — 2 data
    shuffles, no join, no single-partition gather anywhere."""
    plan = plan_of(REGISTRY["events_roc_curve"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 2, plan
    assert "Exchange SinglePartition" not in plan
    assert "Join" not in plan


def test_calibration_curve_census_windows(spark):
    """The reliability fold is the roc_curve contract: one event-sized
    census groupBy + group-keyed windows over at-most-n_bins rows per
    group — 2 data shuffles, no join, no single-partition gather."""
    plan = plan_of(REGISTRY["events_calibration_curve"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 2, plan
    assert "Exchange SinglePartition" not in plan
    assert "Join" not in plan


def test_rollup_report_single_expand_pass(spark):
    """The ROLLUP report is ONE pass: the Expand operator fans each row
    to its 3 grouping levels map-side, partial aggregation combines
    BEFORE the single shuffle — the native grouping-sets plan, no
    union-of-three-aggregates re-scan."""
    plan = plan_of(REGISTRY["orders_rollup_report"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 1, plan
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1, plan


def test_uplift_curve_census_windows(spark):
    """The uplift fold is the roc_curve contract: one event-sized
    census groupBy + census-sized group-keyed windows — 2 data
    shuffles, no join, no single-partition gather."""
    plan = plan_of(REGISTRY["events_uplift_curve"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 2, plan
    assert "Exchange SinglePartition" not in plan
    assert "Join" not in plan


def test_profile_drift_two_one_pass_aggregates(spark):
    """The drift audit is two ONE-pass profile aggregates (each a
    single job over its snapshot regardless of column count, modulo
    the exact-distinct Expand) + a column-count-sized join — never a
    per-column re-scan."""
    plan = plan_of(REGISTRY["documents_profile_drift"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan
    # one scan per snapshot (both derive from the same parquet here)
    assert plan.count("Scan parquet") == 2, plan


def test_classification_report_census_fold(spark):
    """ONE data-sized census groupBy + a census-sized explode/fold:
    2 data shuffles, no join, no window, no single-partition gather."""
    plan = plan_of(
        REGISTRY["events_classification_report"].fn(spark, SMOKE_SF)
    )
    assert data_shuffles(plan) == 2, plan
    assert "Exchange SinglePartition" not in plan
    assert "Join" not in plan
    assert "Window" not in plan


def test_cohens_kappa_census_sized_downstream(spark):
    """The confusion census is the only data-sized pass; the marginal
    folds, their class-key join and the group fold are census-sized.
    No cartesian, no single-partition gather, no window."""
    plan = plan_of(REGISTRY["events_rater_agreement"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan
    # every downstream consumer reuses the localCheckpointed census
    # (the plan roots at the checkpoint RDD), never re-reads the fact
    # table — zero parquet scans below the fold
    assert "Scan parquet" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan


def test_post_strat_ate_two_combinable_groupbys(spark):
    """TWO map-side-combinable groupBys (stratum cells, then the group
    fold) and nothing else — no join, no window, no gather."""
    plan = plan_of(REGISTRY["events_post_strat_ate"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 2, plan
    assert "Exchange SinglePartition" not in plan
    assert "Join" not in plan
    assert "Window" not in plan


def test_cuped_ate_one_combinable_groupby(spark):
    """CUPED is ONE map-side-combinable groupBy (ten conditional
    sums/counts) + per-group scalar algebra — 1 data shuffle, no
    join, no window, no gather."""
    plan = plan_of(REGISTRY["events_cuped_ate"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 1, plan
    assert "Exchange SinglePartition" not in plan
    assert "Join" not in plan
    assert "Window" not in plan


def test_srm_check_one_combinable_groupby(spark):
    """The SRM gate is ONE map-side-combinable groupBy (two conditional
    counts) + scalar algebra — 1 data shuffle, no join, no window."""
    plan = plan_of(REGISTRY["events_srm_check"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 1, plan
    assert "Exchange SinglePartition" not in plan
    assert "Join" not in plan
    assert "Window" not in plan


def test_rrf_fusion_bounded_no_cartesian(spark):
    """The fusion runs over the union of two ALREADY-bounded top-10
    lists — no cartesian anywhere, query terms broadcast into both
    inverted-index prunes."""
    plan = plan_of(REGISTRY["doc_rrf_fusion"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # every rank window is query-partitioned — never a data-sized
    # ungrouped total order (the only SinglePartition exchange is
    # BM25's one-row corpus-stats scalar, same as the doc_bm25_topk
    # gate allows)
    import re as _re

    specs = _re.findall(
        r"row_number\(\) windowspecdefinition\(([^,]*),", plan.lower()
    )
    assert specs and all("query_id" in s for s in specs), plan


def test_mrr_map_eval_single_aggregation_branch(spark):
    """The eval must fold every metric from ONE collected array per
    query — a second aggregation branch over the join would re-execute
    the whole BM25 subtree (the 19-exchange shape this query shipped
    without).  No cartesian; the label census joins query-keyed.

    Scan budget (r13 semi-reduce shape): the retriever reads the raw
    text TWICE by design — a shuffle-free one-row corpus-stats fold and
    the query-vocabulary-reduced match stream (the full-postings
    checkpoint it replaced hid its scan behind an InMemoryRelation) —
    plus the two doc_id-only label-census scans.  A re-executed
    retriever shows up as a THIRD text-bearing scan."""
    plan = plan_of(REGISTRY["bm25_mrr_map_eval"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan
    docscans = re.findall(r"FileScan parquet[^\n]*documents[^\n]*", plan)
    assert len(docscans) <= 4, plan
    text_scans = [s for s in docscans if "text" in s]
    assert len(text_scans) <= 2, plan
    assert data_shuffles(plan) <= 10


def test_nelson_aalen_census_windows_no_python(spark):
    """NA hazard: subjects reduce to a (cohort, day) census before any
    window — both windows run census-sized on the cohort key (3 data
    shuffles: user groupBy, census groupBy, window key); the only
    single-partition gather is the one-row study-end max; no Python,
    no cartesian."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["user_churn_hazard"].fn(spark, SMOKE_SF))
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert data_shuffles(plan) == 3, plan
    assert len(re.findall(r"Exchange SinglePartition", plan)) == 1, plan


def test_log_rank_census_decomposed_no_python(spark):
    """Log-rank: subjects census to (cohort, day, arm) cells, the
    at-risk windows and the O/E/V fold run census-sized (4 data
    shuffles: user groupBy, cell census, wide census, window/fold
    key); one single-partition gather (the study-end max); no Python,
    no cartesian."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["user_churn_logrank"].fn(spark, SMOKE_SF))
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert data_shuffles(plan) == 4, plan
    assert len(re.findall(r"Exchange SinglePartition", plan)) == 1, plan


def test_kruskal_wallis_census_windows_no_join(spark):
    """Kruskal-Wallis: ONE event-sized census groupBy + one census
    window shuffle on the group key (both windows share it) + the
    census-sized arm/group folds — 2 data shuffles total, no join, no
    gather, no Python (the rank_sum contract, k-arm form)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_kruskal_wallis"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 2, plan
    assert "Join" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_spearman_census_joins_no_datasized_window(spark):
    """Spearman: midranks come from the two value CENSUSES (windows are
    census-sized on the group key), rows equi-join to the censuses and
    ONE combinable aggregate collects the moments — no cartesian, no
    Python, no single-partition gather, and every window partitions on
    the group key (never an ungrouped total order)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["lineitem_spearman"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    specs = re.findall(r"windowspecdefinition\(([^,]*),", plan.lower())
    assert specs and all("flag" in s for s in specs), plan


def test_cramers_v_rides_chi2_plan(spark):
    """Cramér's V adds ZERO exchanges to the contingency_chi2 plan —
    the finish is per-group scalar algebra on the already-aggregated
    row (same census/margins/grid shape, no cartesian, no Python)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    chi2 = plan_of(
        REGISTRY["events_type_hour_independence"].fn(spark, SMOKE_SF)
    )
    v = plan_of(REGISTRY["events_cramers_v"].fn(spark, SMOKE_SF))
    assert "CartesianProduct" not in v, v
    assert "EvalPython" not in v, v
    assert data_shuffles(v) == data_shuffles(chi2), (v, chi2)
    assert v.count("BroadcastExchange") == chi2.count("BroadcastExchange")


def test_readability_one_combinable_groupby(spark):
    """Readability is per-row JVM regex into ONE map-side-combinable
    groupBy + per-group scalar algebra — 1 data shuffle, no join, no
    window, no Python, no gather."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["doc_readability"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 1, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_cmh_two_combinable_groupbys_no_window(spark):
    """CMH: one event-sized cell-census groupBy + one census-sized
    group fold — 2 data shuffles, no window, no join, no gather, no
    Python (the post_strat_ate contract, odds-ratio form)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_cmh_test"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 2, plan
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_anova_two_combinable_groupbys_no_window(spark):
    """ANOVA: one event-sized moment-census groupBy + one census-sized
    group fold — 2 data shuffles, no window, no join, no gather, no
    Python (the CMH/post_strat contract, moment form)."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["events_anova_f"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 2, plan
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_char_entropy_census_pipelined_no_join(spark):
    """Char entropy: the per-char explode pipelines into the partial
    aggregate — the one data exchange carries the alphabet-bounded
    census; the fold is row-local.  No join, no window, no Python."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["doc_char_entropy"].fn(spark, SMOKE_SF))
    assert data_shuffles(plan) == 2, plan  # char census + group fold
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_vocab_gini_census_window_no_join(spark):
    """Vocab Gini: token explode pipelines into the census aggregate;
    the rank window and fold run census-sized on the source key — no
    join, no Python, no gather."""
    from dp1_data_wrangling_spark.registry import REGISTRY

    plan = plan_of(REGISTRY["doc_vocab_gini"].fn(spark, SMOKE_SF))
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    specs = re.findall(r"row_number\(\) windowspecdefinition\(([^,]*),", plan.lower())
    assert specs and all("source" in s for s in specs), plan
