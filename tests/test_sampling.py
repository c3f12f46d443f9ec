"""Dataset-assembly operators (operators/sampling.py): deterministic
splits, exact quantiles, vocab top-k, contamination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from canal_phoenix_adapter_spark.operators import sampling


def test_hash_split_deterministic_and_partition_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    frac = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = sampling.hash_split(df, "doc_id", frac)
    b = sampling.hash_split(df.repartition(13), "doc_id", frac)
    ma = {r["doc_id"]: r["split"] for r in a.collect()}
    mb = {r["doc_id"]: r["split"] for r in b.collect()}
    assert ma == mb  # same key -> same split under any partitioning
    counts = {k: sum(1 for v in ma.values() if v == k) for k in frac}
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert 0.05 < counts["val"] / 2000 < 0.15


def test_hash_split_rejects_over_one():
    with pytest.raises(ValueError, match="> 1"):
        sampling.hash_split(None, "id", {"a": 0.9, "b": 0.2})


def test_hash_split_remainder_labeled_rest(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = sampling.hash_split(df, "doc_id", {"train": 0.5})
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits == {"train", "rest"}


def test_group_quantiles_exact(spark):
    df = spark.createDataFrame(
        [("a", v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]] + [("b", 42)],
        "g string, v long",
    )
    out = {r["g"]: (r["q_50"], r["q_90"]) for r in
           sampling.group_quantiles(df, "g", "v", [0.5, 0.9], exact=True).collect()}
    # ceil-rank percentile_disc: q50 of 1..10 -> rank 5 -> 5; q90 -> rank 9 -> 9
    assert out["a"] == (5, 9)
    assert out["b"] == (42, 42)  # singleton group: every quantile = the value


def test_group_quantiles_ignores_nulls(spark):
    """Standard percentile_disc semantics: NULL values are excluded
    before ranking (engines disagree on where NULL sorts — Spark
    windows NULLS FIRST asc, DuckDB NULLS LAST — and a NULL in the
    ranked set would poison value-at-rank). An all-NULL group yields
    no row."""
    df = spark.createDataFrame(
        [("a", None), ("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", None)],
        "g string, v long",
    )
    out = {r["g"]: r["q_50"] for r in
           sampling.group_quantiles(df, "g", "v", [0.5], exact=True).collect()}
    # 4 non-null values, rank ceil(0.5*4)=2 -> 2 (a NULLS FIRST rank
    # over 5 rows would land rank 3 -> wrong value or NULL)
    assert out == {"a": 2}


def test_group_quantiles_default_is_approx_no_window(spark):
    """The DEFAULT path is percentile_approx (r12 verdict: the exact
    rank window sorts each group in ONE task, measured compounding
    ~6.4x wall/decade — approx is the governed default, exact the
    explicit opt-in). Kill: flipping the default back to exact puts a
    Window (single-task per-group sort) into the default plan; the
    approx plan must have NONE, and must carry the summary aggregate."""
    df = spark.createDataFrame(
        [("a", v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]] + [("b", 42), ("b", None)],
        "g string, v long",
    )
    from tests.plan_helpers import explain_str

    default = sampling.group_quantiles(df, "g", "v", [0.5, 0.9])
    plan = explain_str(default)
    assert "Window" not in plan and "percentile_approx" in plan
    exact_plan = explain_str(
        sampling.group_quantiles(df, "g", "v", [0.5, 0.9], exact=True)
    )
    assert "Window" in exact_plan
    # on small groups the GK summary is exact: same values, same
    # column names, same group-presence semantics as the exact path
    out = {r["g"]: (r["q_50"], r["q_90"]) for r in default.collect()}
    assert out == {"a": (5, 9), "b": (42, 42)}


def test_group_quantiles_default_all_null_group_yields_no_row(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", None)], "g string, v long"
    )
    out = {r["g"]: r["q_50"] for r in
           sampling.group_quantiles(df, "g", "v", [0.5]).collect()}
    assert out == {"a": 1}


def test_group_quantiles_rejects_colliding_aliases(spark):
    """Two quantiles rounding to the same whole percent would emit
    duplicate q_<pct> columns (AMBIGUOUS_REFERENCE downstream) —
    rejected up front."""
    import pytest

    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError, match="collide"):
        sampling.group_quantiles(df, "g", "v", [0.115, 0.125])


def test_vocab_topk_rank_and_ties(spark):
    df = spark.createDataFrame(
        [(1, "b a"), (2, "a b"), (3, "a c"), (4, "a a a")],
        "doc_id long, text string",
    )
    rows = sampling.vocab_topk(df, "text", k=2).collect()
    assert [(r["rank"], r["token"], r["doc_freq"]) for r in rows] == [
        (1, "a", 4), (2, "b", 2),
    ]


def test_contamination_hits(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "clean document"), (3, "quick brown and fox")],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame([("quick brown",), ("fox",)], "probe string")
    got = {r["doc_id"]: (r["n_probes_hit"], r["first_probe"])
           for r in sampling.contamination_hits(docs, probes).collect()}
    assert got == {1: (2, "fox"), 3: (2, "fox")}  # doc 2 clean, absent
