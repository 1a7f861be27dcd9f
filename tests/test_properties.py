"""Property-based tests (hypothesis) for the signature semantics
(SURVEY.md §5.2.3): find-first invariants and interval-overlap algebra on
*generated* inputs, not just the fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dp1_data_wrangling_spark.operators.find_first import find_first
from dp1_data_wrangling_spark.operators.intervals import overlapping_pairs

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# (data_id, collection, tie) rows; collections run_0..run_3, chain holds 0..2
dataset_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=10_000),
    ),
    min_size=1,
    max_size=40,
)


@given(rows=dataset_rows)
@SETTINGS
def test_find_first_invariants(spark, rows):
    df = spark.createDataFrame(
        [(d, f"run_{c}", str(t)) for d, c, t in rows],
        "data_id int, run string, dataset_id string",
    )
    chain = spark.createDataFrame(
        [(f"run_{i}", i) for i in range(3)], "child string, position int"
    )
    out = find_first(df, chain, ["data_id"], collection_col="run").collect()

    in_chain = [(d, c, t) for d, c, t in rows if c < 3]
    # one row per data ID present in chain collections
    assert {r["data_id"] for r in out} == {d for d, _, _ in in_chain}
    assert len(out) == len({d for d, _, _ in in_chain})
    # each winner is the min (position, tie) row for its data ID, and a
    # genuine input row (result ⊆ input)
    for r in out:
        cands = [(c, str(t)) for d, c, t in in_chain if d == r["data_id"]]
        best = min(cands)
        assert (int(r["run"].removeprefix("run_")), r["dataset_id"]) == best
        assert (r["data_id"], int(r["run"].removeprefix("run_")), int(r["dataset_id"])) in rows


@given(rows=dataset_rows)
@SETTINGS
def test_find_first_calibration_bypass_keeps_chain_rows(spark, rows):
    df = spark.createDataFrame(
        [(d, f"run_{c}", str(t)) for d, c, t in rows],
        "data_id int, run string, dataset_id string",
    )
    chain = spark.createDataFrame(
        [(f"run_{i}", i) for i in range(3)], "child string, position int"
    )
    out = find_first(
        df, chain, ["data_id"], collection_col="run", is_calibration=True
    )
    assert out.count() == sum(1 for _, c, _ in rows if c < 3)


interval_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.integers(min_value=0, max_value=50),  # begin
        st.integers(min_value=1, max_value=20),  # length
    ),
    min_size=1,
    max_size=25,
)


@given(rows=interval_rows)
@SETTINGS
def test_overlap_check_equals_brute_force(spark, rows):
    """The sort-based neighbor check finds an overlap iff the O(n²)
    definition does, per key (half-open [begin, end))."""
    df = spark.createDataFrame(
        [(k, b, b + ln) for k, b, ln in rows],
        "key int, begin_nsec long, end_nsec long",
    )
    found = overlapping_pairs(df, ["key"], tie_breaker=F.col("end_nsec")).count() > 0
    brute = False
    ivs = [(k, b, b + ln) for k, b, ln in rows]
    for i in range(len(ivs)):
        for j in range(i + 1, len(ivs)):
            a, b_ = ivs[i], ivs[j]
            if a[0] == b_[0] and a[1] < b_[2] and b_[1] < a[2]:
                brute = True
    assert found == brute
