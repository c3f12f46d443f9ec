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
tag orders right (0) before left (1) at equal ts. When the right side
can hold several rows per (key, ts), pass ``right_order`` columns to
pick a deterministic winner (greatest right_order tuple wins);
without it, which duplicate wins depends on partition order —
pre-collapse with ``keep_last`` or pass ``right_order``. The
tie-break is only as deterministic as the tuple: duplicate (key, ts)
rows whose right_order values are also equal — or all NULL — still
fall back to partition order (NULLs sort first, so they lose to any
non-NULL tuple, but not to each other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    right_order: list[str] | None = None,
) -> DataFrame:
    """Point-in-time join of ``right`` onto ``left``.

    Returns all ``left`` columns plus every non-key, non-ts ``right``
    column (renamed with ``suffix`` on collision) and
    ``<right_ts><suffix>`` — the matched right row's timestamp (null
    when no right row precedes/follows).

    ``direction``: 'backward' (latest right with right_ts <= left_ts,
    the default) or 'forward' (earliest right with right_ts >=
    left_ts, computed as backward over negated timestamps).

    ``tolerance``: when set, a match farther than this is nulled out —
    pandas ``merge_asof`` tolerance semantics, applied as a
    post-projection so the plan shape is unchanged. Units: epoch
    micros when either ts column is a timestamp, epoch days when both
    are dates, the columns' own unit when both are numeric.

    ``right_order``: right-side columns breaking ties among duplicate
    (key, ts) right rows — the row with the GREATEST right_order tuple
    wins, deterministically on any partitioning. They extend the
    window's orderBy (no extra shuffle or pass); left rows are
    unaffected (the tag still dominates at equal ts).
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
    out_names = [ts_out, *payload]
    # Three collision classes: two right columns mapping to one output
    # name, the ts output clashing with a payload output, and — the
    # subtle one — a SUFFIXED name landing on a *different* existing
    # left column (left has [x, x_right], right has x: x -> x_right
    # duplicates left's own x_right in the output).
    if (
        len(payload) != len(payload_src)
        or ts_out in payload
        or any(n in left_names for n in out_names)
    ):
        raise ValueError(
            f"asof_join output-name collision after applying suffix "
            f"{suffix!r}: right columns {[right_ts, *payload_src]} map to "
            f"{out_names} against left columns {sorted(left_names)}; rename "
            f"the clashing right column(s) before joining"
        )

    sign = F.lit(1) if direction == "backward" else F.lit(-1)

    # The merge ordering needs a NUMERIC timeline (forward mode negates
    # it, and Multiply rejects temporal operands). BOTH sides must land
    # on the SAME unit: converting each side by its own type (timestamp
    # -> micros, date -> days) would silently interleave micros with
    # days on the merged axis — wrong matches, not an error, since both
    # legs are bigint. So the unit is chosen from the PAIR: any
    # timestamp on either side promotes both to epoch micros (a date
    # casts to midnight); two dates use epoch days; two numerics pass
    # through raw. A temporal column paired with a numeric one is
    # ambiguous (which epoch? which unit?) and raises. Tolerance is in
    # the common unit: micros / days / the raw numeric unit.
    def _unit(dtype: T.DataType) -> str:
        if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
            return "micros"
        if isinstance(dtype, T.DateType):
            return "days"
        return "numeric"

    l_unit = _unit(left.schema[left_ts].dataType)
    r_unit = _unit(right.schema[right_ts].dataType)
    if {l_unit, r_unit} == {"micros", "days"}:
        unit = "micros"
    elif l_unit != r_unit:
        raise ValueError(
            f"asof_join ts columns mix a temporal type with a numeric one "
            f"(left {left_ts!r} is {l_unit}, right {right_ts!r} is {r_unit}); "
            f"convert the numeric side to timestamp/date (or the temporal "
            f"side to its epoch number) before joining"
        )
    else:
        unit = l_unit

    def num_expr(col: F.Column, dtype: T.DataType) -> F.Column:
        if unit == "micros" and _unit(dtype) != "numeric":
            return F.unix_micros(col.cast("timestamp"))
        if unit == "days":
            return F.unix_date(col)
        return col

    def ts_num(df: DataFrame, c: str) -> F.Column:
        return num_expr(F.col(c), df.schema[c].dataType)

    # The matched right row travels as ONE struct column, so a match is
    # atomic: per-column last(ignorenulls) would stitch fields from
    # DIFFERENT right rows whenever the newest match carries a NULL in
    # some payload column (the older row's value would bleed through).
    # The struct itself is non-null on every right row — even an
    # all-null payload — and null on left rows, so last(ignorenulls)
    # over it picks exactly the latest preceding right ROW.
    order_cols = list(right_order or [])
    # EQUI-JOIN null semantics: a NULL key matches NOTHING. The window
    # groups NULL partition keys together, so without this filter a
    # NULL-key left row would fabricate a match against NULL-key right
    # rows. Dropping NULL-key RIGHT rows leaves NULL-key left rows in
    # a partition with no right rows -> matched stays NULL (left-join
    # behavior), exactly like pandas merge_asof / SQL. A NULL right_ts
    # is the same class (r13 review, reproduced): `right_ts <= left_ts`
    # is NULL -> no match in SQL, but on the merged timeline a NULL ts
    # sorts NULLS FIRST — "before everything" — so an unknown-time
    # right row was matched by every left row it preceded. (NULL
    # left_ts rows already behave: sorted first, nothing precedes
    # them, match stays NULL.)
    r_src = right.where(F.col(right_ts).isNotNull())
    for k in on:
        r_src = r_src.where(F.col(k).isNotNull())
    r = r_src.select(
        *[F.col(k) for k in on],
        (ts_num(right, right_ts) * sign).alias("__asof_ts"),
        F.lit(0).alias("__asof_tag"),
        *[F.col(c).alias(f"__asof_ord{i}") for i, c in enumerate(order_cols)],
        F.struct(
            F.col(right_ts).alias(ts_out),
            *[F.col(src).alias(dst) for dst, src in payload.items()],
        ).alias("__asof_row"),
    )
    l = left.select(
        "*",
        (ts_num(left, left_ts) * sign).alias("__asof_ts"),
        F.lit(1).alias("__asof_tag"),
    )
    # unionByName with allowMissingColumns aligns the two schemas,
    # null-filling left-only columns and the match struct on the
    # opposite side.
    u = l.unionByName(r, allowMissingColumns=True)

    # Tie-break columns sort ascending with NULLS FIRST, so on left
    # rows (all-null ords) the tag still decides; among duplicate
    # (key, ts) right rows the greatest right_order tuple sorts last
    # and last(ignorenulls) picks it.
    w = (
        Window.partitionBy(*on)
        .orderBy(
            "__asof_ts",
            "__asof_tag",
            *[F.asc_nulls_first(f"__asof_ord{i}") for i in range(len(order_cols))],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__asof_row", ignorenulls=True).over(w)
    out = (
        u.select(
            *[F.col(c) for c in left.columns],
            F.col("__asof_tag"),
            matched.alias("__asof_row"),
        )
        .where(F.col("__asof_tag") == 1)
        .drop("__asof_tag")
    )
    if tolerance is not None:
        m_ts = F.col("__asof_row")[ts_out]
        # gap on the same NUMERIC timeline as the ordering (timestamp
        # minus timestamp yields an INTERVAL, which an int tolerance
        # cannot compare against)
        l_num = num_expr(F.col(left_ts), left.schema[left_ts].dataType)
        m_num = num_expr(m_ts, right.schema[right_ts].dataType)
        gap = l_num - m_num if direction == "backward" else m_num - l_num
        out = out.withColumn(
            "__asof_row", F.when(m_ts.isNotNull() & (gap <= tolerance), F.col("__asof_row"))
        )
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col("__asof_row")[c].alias(c) for c in out_names],
    )
