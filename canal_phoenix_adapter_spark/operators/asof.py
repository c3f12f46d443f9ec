"""As-of (point-in-time) join — the temporal-join operator the
reference's row stream implies but Spark lacks as a built-in.

For every left row, attach the single latest right row with the same
key whose timestamp is <= (backward) or >= (forward) the left row's
timestamp. Classic uses: latest quote before each trade, latest click
before each purchase, latest config before each event.

Implementation is the union-merge plan, NOT a range join:

    tag(left)=1, tag(right)=0 -> union by name -> one shuffle on the
    key -> per-key sort by (ts, tag) -> running last_value(payload,
    ignorenulls) -> keep left rows.

Scale notes (the reason this shape wins at 100 TB):
  * exactly ONE shuffle, on the join key — same cost as any equi-join
    on that key; never a BroadcastNestedLoopJoin or a range-condition
    cartesian (a naive `l.ts >= r.ts` join emits |matches| rows per
    left row before the keep-latest filter — quadratic on hot keys).
  * state per key is O(1) during the running-window pass (the window
    is rows-unbounded-preceding with `last(ignorenulls)` — Spark
    evaluates it as a running accumulator, not a buffered frame).
  * skewed keys degrade to a sort of that key's partition, not to a
    cross product.

Ties: a right row AT the left row's timestamp is visible in backward
mode (inclusive, matching DuckDB/pandas `merge_asof` defaults) — the
tag orders right (0) before left (1) at equal ts. Callers must ensure
the right side has at most one row per (key, ts): pre-collapse with
``keep_last``-style aggregation, else which row wins is
tie-broken by ``right_order`` columns (last one wins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_right",
    tolerance: int | None = None,
) -> DataFrame:
    """Point-in-time join of ``right`` onto ``left``.

    Returns all ``left`` columns plus every non-key, non-ts ``right``
    column (renamed with ``suffix`` on collision) and
    ``<right_ts><suffix>`` — the matched right row's timestamp (null
    when no right row precedes/follows).

    ``direction``: 'backward' (latest right with right_ts <= left_ts,
    the default) or 'forward' (earliest right with right_ts >=
    left_ts, computed as backward over negated timestamps).

    ``tolerance``: when set, a match farther than this (in the ts
    columns' own units) is nulled out — pandas ``merge_asof``
    tolerance semantics, applied as a post-projection so the plan
    shape is unchanged.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    key_set = set(on)
    payload_src = [c for c in right.columns if c not in key_set and c != right_ts]
    left_names = set(left.columns)

    def out_name(c: str) -> str:
        return c + suffix if c in left_names else c

    payload = {out_name(c): c for c in payload_src}
    ts_out = out_name(right_ts)

    sign = F.lit(1) if direction == "backward" else F.lit(-1)

    r = right.select(
        *[F.col(k) for k in on],
        (F.col(right_ts) * sign).alias("__asof_ts"),
        F.lit(0).alias("__asof_tag"),
        F.col(right_ts).alias(ts_out),
        *[F.col(src).alias(dst) for dst, src in payload.items()],
    )
    l = left.select(
        "*",
        (F.col(left_ts) * sign).alias("__asof_ts"),
        F.lit(1).alias("__asof_tag"),
    )
    # unionByName with allowMissingColumns aligns the two schemas,
    # null-filling left-only and payload columns on the opposite side.
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy("__asof_ts", "__asof_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = [F.last(c, ignorenulls=True).over(w).alias(c) for c in [ts_out, *payload]]
    out = u.select(
        *[F.col(c) for c in left.columns], F.col("__asof_tag"), *filled
    ).where(F.col("__asof_tag") == 1)
    out = out.drop("__asof_tag")
    if tolerance is not None:
        gap = (
            F.col(left_ts) - F.col(ts_out)
            if direction == "backward"
            else F.col(ts_out) - F.col(left_ts)
        )
        ok = F.col(ts_out).isNotNull() & (gap <= tolerance)
        out = out.select(
            *[F.col(c) for c in left.columns],
            *[F.when(ok, F.col(c)).alias(c) for c in [ts_out, *payload]],
        )
    return out
