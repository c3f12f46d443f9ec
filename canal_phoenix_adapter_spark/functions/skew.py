"""Skew mitigation: salted join for hot keys.

AQE's skew-join split (spark.sql.adaptive.skewJoin) handles most
skew by splitting oversized shuffle partitions, but it cannot split a
SINGLE key's rows across tasks when one key dominates (the classic
null-key / default-value / celebrity-entity problem at 100 TB).
Salting can: the skewed side gets a salt in [0, n) derived from its
non-key columns, the other side is replicated once per salt value,
and the join key becomes (key, salt) — one hot key fans out over n
tasks.

Cost model: replicates the OTHER side n times — use when that side is
dimension-sized (or pre-filtered) and the skewed side has a hot key
AQE cannot split. This composes with, not replaces, AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def default_salt(skewed: DataFrame, on: list[str], num_salts: int) -> Column:
    """The default salt: xxhash64 of the skewed side's non-key columns
    mod num_salts — key-independent (same key lands on different
    salts) yet deterministic under task retry. A named single
    definition so tests can assert the REAL expression spreads a hot
    key instead of re-deriving their own copy of it.

    Honest limitation: a content-derived salt spreads a hot key only
    as far as its rows' non-key values vary. A hot key whose rows are
    near-identical (constant default payload) still lands on one salt
    — pass ``salt_expr`` with a row-unique attribute (an id, an
    offset) for that shape. The retry-unstable alternatives
    (rand(), monotonically_increasing_id) re-roll when a stage
    recomputes, which silently double-or-drops rows under the
    replicated join — why they are not the default."""
    non_key = [c for c in skewed.columns if c not in on]
    if not non_key:
        raise ValueError("no non-key columns to derive a salt from; pass salt_expr")
    return F.pmod(F.xxhash64(*[F.col(c) for c in non_key]), F.lit(num_salts))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
    salt_expr: Column | None = None,
) -> DataFrame:
    """Join ``skewed`` (hot-keyed big side) to ``other`` on ``on``,
    fanning each key over ``num_salts`` sub-keys.

    The salt must be independent of the join key (same key must land
    on DIFFERENT salts) yet deterministic under task retry (a rand()
    salt re-rolls when a stage recomputes, which is correct for joins
    but makes runs unreproducible); default: xxhash64 of the skewed
    side's non-key columns mod n. Pass ``salt_expr`` to override
    (e.g. a monotonic row attribute).

    Result == plain ``skewed.join(other, on, how)`` row-for-row; only
    the physical key space changes. Supported how: inner / left /
    left_outer (the replicated side is the lookup side).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join does not support how={how!r}")
    if num_salts < 1:
        raise ValueError(f"num_salts must be >= 1, got {num_salts}")
    if salt_expr is None:
        salt_expr = default_salt(skewed, on, num_salts)
    # pmod UNCONDITIONALLY: the docstring invites raw ids/offsets as
    # salt_expr, and a value outside [0, num_salts) matches no replica
    # — an inner join silently DROPPED those rows (r10 review). pmod
    # of the already-modded default is a no-op; bigint-first cast keeps
    # ids > 2^31 from overflowing under ANSI; coalesce(0) because a
    # NULL salt value is a NULL equi-join key — the same silent drop
    # one level up (r10 fix-review).
    s = skewed.withColumn(
        SALT_COL,
        F.pmod(F.coalesce(salt_expr.cast("bigint"), F.lit(0)),
               F.lit(num_salts)).cast("int"),
    )
    o = other.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<int>")),
    )
    return s.join(o, on=[*on, SALT_COL], how=how).drop(SALT_COL)
