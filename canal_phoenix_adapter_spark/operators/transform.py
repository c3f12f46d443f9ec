"""Projection / rename / exclude / enum / identifier-case pipeline.

Re-expresses the reference's column-mapping layer:
  P1 rename        support/SyncUtil.java:19-51 (targetColumns {tgt: src},
                   empty source => identity)
  P2 mapAll        support/SyncUtil.java:25-47 (all source cols except
                   excludes, overlaid with explicit renames)
  P3 exclude       support/SyncUtil.java:42 (case-insensitive)
  P4 enum decode   config/MappingConfig.java:273-287
  P6 escapeUpper   config/MappingConfig.java:108,119-125
  P5 coercion      via functions/coerce.py when a target schema is given

One declarative ``select`` — Catalyst prunes the parquet scan to
exactly the mapped source columns (column pruning reaches ReadSchema),
so an excluded column is never even read at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from canal_phoenix_adapter_spark.config import DbMapping
from canal_phoenix_adapter_spark.functions.coerce import coerce_to
from canal_phoenix_adapter_spark.functions.enums import enum_decode


def mapping_columns(cfg: DbMapping, source_columns: list[str]) -> dict[str, str]:
    """target-name -> source-name map, the Spark equivalent of
    SyncUtil.getColumnsMap (support/SyncUtil.java:19-51).

    mapAll: every source column not excluded maps to itself, then
    explicit targetColumns entries overlay (rename wins). Without
    mapAll only explicit targetColumns are used (empty value = same
    name). Exclusion is case-insensitive (SyncUtil.java:42).
    """
    excludes = {c.lower() for c in cfg.exclude_columns}
    out: dict[str, str] = {}
    if cfg.map_all:
        explicit_sources = {
            (src or tgt).lower() for tgt, src in (cfg.target_columns or {}).items()
        }
        # also skip a source column whose name collides CASE-
        # INSENSITIVELY with an explicit TARGET: escape() uppercases
        # aliases, so keeping both would emit two identically-named
        # output columns (AMBIGUOUS_REFERENCE downstream). Explicit
        # rename wins, matching the "overlay" contract. (The reference
        # keys its map case-sensitively and would emit the duplicate,
        # SyncUtil.java:25-47 — a config shape Phoenix itself rejects,
        # so deduping here is the strictly-saner reading.)
        explicit_targets = {t.lower() for t in (cfg.target_columns or {})}
        for col in source_columns:
            if (
                col.lower() in excludes
                or col.lower() in explicit_sources
                or col.lower() in explicit_targets
            ):
                continue
            out[col] = col
    for tgt, src in (cfg.target_columns or {}).items():
        if tgt.lower() in excludes:
            continue
        out[tgt] = src or tgt
    return out


def apply_mapping(
    df: DataFrame,
    cfg: DbMapping,
    target_schema: T.StructType | None = None,
) -> DataFrame:
    """Apply the full projection pipeline to a source DataFrame.

    Order matters and mirrors the reference sync path
    (PhoenixSyncService.java:370-465): map/rename -> enum decode ->
    type coercion (when a target schema is known) -> identifier
    normalization (escapeUpper).

    ``skipMissing`` (config/MappingConfig.java:107, honored at
    PhoenixSyncService.java:399-411): when a target schema is known
    and a mapped column is absent from it, drop the column instead of
    carrying it through to a heal/failure downstream. Without the
    flag, unknown columns pass through untouched — the schema-heal
    path (align_to_schema/evolve) owns them.
    """
    colmap = mapping_columns(cfg, df.columns)
    target_types = (
        {f.name.lower(): f.dataType for f in target_schema.fields}
        if target_schema is not None
        else {}
    )
    enum_lc = {k.lower(): v for k, v in (cfg.enum_columns or {}).items()}
    exprs = []
    for tgt, src in colmap.items():
        if (
            cfg.skip_missing
            and target_schema is not None
            and tgt.lower() not in target_types
        ):
            continue
        c = F.col(src)
        labels = enum_lc.get(tgt.lower()) or enum_lc.get(src.lower())
        if labels:
            c = enum_decode(c, labels)  # enum targets are VARCHAR
        elif tgt.lower() in target_types:
            c = coerce_to(c, target_types[tgt.lower()])
        exprs.append(c.alias(cfg.escape(tgt)))
    return df.select(*exprs)
