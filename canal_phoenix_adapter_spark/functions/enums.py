"""Enum decode: 1-based index -> label, out-of-range/non-numeric pass
through untouched (config/MappingConfig.java:273-287, applied at
PhoenixSyncService.java:413,444,589)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def enum_decode(col: Column, labels: list[str]) -> Column:
    """``labels[v-1]`` when 1 <= v <= len(labels); otherwise the raw
    value (as string — the decoded column is string-typed, matching the
    reference where enum targets are VARCHAR, TypeUtil.java:134-136).

    try_cast/try_element_at keep NULL-on-garbage + no-ANSI-error
    semantics regardless of session conf (Spark 4 defaults ANSI on).
    """
    arr = F.array(*[F.lit(x) for x in labels])
    idx = col.cast("string").try_cast("int")
    return F.when(
        idx.isNotNull() & idx.between(1, len(labels)),
        F.try_element_at(arr, idx),
    ).otherwise(col.cast("string"))
