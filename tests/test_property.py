"""Property-based check (SURVEY §5.4): for random CDC event streams,
the engine's merged state equals a naive in-order Python dict fold of
the same events — the reference's semantics distilled (per-key
last-event-wins, PK-change delete-then-upsert, truncate wipes,
PhoenixSyncService.java:234-254,425-456,505-513).

Also checks batch-split invariance: applying the stream in arbitrary
micro-batch chunks (state carried through merge_cdc) ends in the same
state as one big batch — the property that makes foreachBatch replay
safe.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from canal_phoenix_adapter_spark.operators.merge import merge_cdc

KEYS = st.integers(min_value=1, max_value=4)
VALS = st.integers(min_value=0, max_value=99)


@st.composite
def events(draw):
    n = draw(st.integers(min_value=1, max_value=18))
    out = []
    for seq in range(n):
        op = draw(
            st.sampled_from(
                ["INSERT", "UPDATE", "UPDATE", "DELETE", "TRUNCATE"]
            )
        )
        if op == "TRUNCATE":
            out.append((seq, op, None, None, None))
            continue
        key = draw(KEYS)
        if op == "DELETE":
            out.append((seq, op, key, None, None))
            continue
        old = draw(st.one_of(st.none(), KEYS)) if op == "UPDATE" else None
        out.append((seq, op, key, draw(VALS), old))
    return out


def naive_fold(evts):
    st_ = {}
    for _seq, op, key, val, old in evts:
        if op == "TRUNCATE":
            st_.clear()
        elif op == "DELETE":
            st_.pop(key, None)
        else:
            if old is not None and old != key:
                st_.pop(old, None)
            st_[key] = val
    return st_


SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("v", T.LongType()),
        T.StructField("old_id", T.LongType()),
    ]
)


def spark_fold(spark, evts, cuts):
    """Apply evts through merge_cdc in chunks split at `cuts`."""
    state = None
    bounds = [0, *sorted(cuts), len(evts)]
    for lo, hi in zip(bounds, bounds[1:]):
        chunk = evts[lo:hi]
        if not chunk:
            continue
        df = spark.createDataFrame(chunk, SCHEMA)
        state = merge_cdc(state, df, ["id"])
    if state is None:
        return {}
    return {r["id"]: r["v"] for r in state.collect()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(evts=events(), data=st.data())
def test_merge_cdc_equals_naive_fold(spark, evts, data):
    expected = naive_fold(evts)

    got_single = spark_fold(spark, evts, cuts=[])
    assert got_single == expected

    cuts = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=len(evts)),
            min_size=1,
            max_size=2,
        )
    )
    got_batched = spark_fold(spark, evts, cuts)
    assert got_batched == expected
