"""Batch backfill (ETL) + count: scan -> condition -> transform ->
idempotent load.

Re-expresses service/PhoenixEtlService.java and the count API:
  S2  conditional source scan      importData, :243-247
  F2  SYS_TIME incremental filter  :312-333
  F3  templated etlCondition       :334-342
  A1  count of target              PhoenixAdapter.java:216-255
  A2  count of filtered extract    :250-261
  X1  range-split parallel extract :264-287  (subsumed by Spark
      partitioned reads — spark.read.jdbc/parquet already splits)
  X3  delete-before-insert load    :409-451  (dropDuplicates(pk) —
      idempotent set semantics for free)

Everything is a declarative DataFrame chain, so Catalyst pushes the
WHERE into the parquet/JDBC scan (PushedFilters) and prunes columns to
the mapped set (ReadSchema) — at 100 TB the predicate runs inside the
scan, not after it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from canal_phoenix_adapter_spark.config import DbMapping
from canal_phoenix_adapter_spark.operators.transform import apply_mapping

SYS_TIME_COLUMN = "SYS_TIME"  # PhoenixEtlService.java:313 (case-insensitive)


def render_condition(template: str, params: list[object] | None) -> str:
    """Substitute {0},{1}... placeholders (F3,
    PhoenixEtlService.java:334-342). The reference does plain string
    substitution into SQL; we render into an expr() string."""
    out = template
    for i, p in enumerate(params or []):
        out = out.replace("{" + str(i) + "}", str(p))
    # the reference's templates start with 'where' (mytest_user.yml);
    # strip it so the remainder is a bare boolean expression.
    return re.sub(r"^\s*where\s+", "", out, flags=re.IGNORECASE)


def append_condition(
    df: DataFrame, cfg: DbMapping, params: list[object] | None = None
) -> DataFrame:
    """ETL extract predicate (PhoenixEtlService.appendCondition,
    :310-343): use the templated etlCondition when configured; else, if
    exactly one param is given and the source has a SYS_TIME column,
    apply the incremental filter SYS_TIME >= param (F2)."""
    if cfg.etl_condition:
        return df.where(F.expr(render_condition(cfg.etl_condition, params)))
    if params and len(params) == 1:
        sys_col = next(
            (c for c in df.columns if c.lower() == SYS_TIME_COLUMN.lower()), None
        )
        if sys_col is not None:
            return df.where(F.col(sys_col) >= F.lit(params[0]))
    return df


def etl_import(
    source: DataFrame,
    cfg: DbMapping,
    params: list[object] | None = None,
    target_schema: T.StructType | None = None,
) -> DataFrame:
    """Full backfill pipeline (importData, PhoenixEtlService.java:220-307):
    conditional scan -> mapping/enum/coercion transform -> idempotent
    dedup on PK (X3: the reference deletes-then-upserts every row so a
    re-run converges). The per-PK winner is the max-by-payload-value
    row, NOT dropDuplicates(pk) — that keeps whichever row a task saw
    first (partitioning-dependent), so re-runs would not converge.
    EXCEPTION: when any payload column is unorderable (map/variant/
    calendar-interval anywhere in its type — ANSI day-time/year-month
    intervals ARE orderable and keep the deterministic path),
    max(struct) has no total order and the dedup falls back to
    dropDuplicates(pk) — one row per PK still, but the winner among
    true duplicates is partitioning-dependent.

    Row count / range-split bookkeeping (steps 5-6 of SURVEY §3.2) is
    subsumed by Spark's partitioned scan planning.
    """
    extracted = append_condition(source, cfg, params)
    mapped = apply_mapping(extracted, cfg, target_schema)
    pk_cols = resolve_pk_columns(cfg, mapped.columns)
    payload = [c for c in mapped.columns if c not in set(pk_cols)]
    if not pk_cols or not payload:
        return mapped.dropDuplicates()  # full-row set semantics: deterministic
    fields = {f.name: f.dataType for f in mapped.schema.fields}
    if any(_unorderable(fields[c]) for c in payload):
        # map-typed payload has no total order: max(struct) would fail
        # at analysis. dropDuplicates keeps a partitioning-dependent
        # winner — re-runs may not converge on this config shape.
        return mapped.dropDuplicates(pk_cols)
    # max over the payload struct directly — ordering key IS the kept
    # value, so the aggregation buffer carries ONE payload copy
    return (
        mapped.groupBy(*pk_cols)
        .agg(F.max(F.struct(*payload)).alias("__t"))
        .select(*pk_cols, "__t.*")
        .select(*mapped.columns)
    )


_UNORDERABLE_LEAVES = tuple(
    t for t in (getattr(T, n, None)
                for n in ("MapType", "VariantType", "CalendarIntervalType"))
    if t is not None
)


def _unorderable(dt: T.DataType) -> bool:
    """True where Spark's TypeUtils.checkForOrderingExpr rejects the
    type: map/variant/calendar-interval anywhere in the tree (incl.
    nested under struct/array, and inside a UDT's sql storage type)."""
    if isinstance(dt, _UNORDERABLE_LEAVES):
        return True
    if isinstance(dt, T.ArrayType):
        return _unorderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_unorderable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.UserDefinedType):
        return _unorderable(dt.sqlType())
    return False


def resolve_pk_columns(cfg: DbMapping, columns: list[str]) -> list[str]:
    """Resolve each configured PK to the column name the mapping
    actually emitted: the escaped TARGET name when the rename is
    declared in targetColumns, else the escaped SOURCE name (a
    targetPk-only rename rides through mapAll under its source name —
    keying on the target name would be an unresolvable-column error
    for a config shape the reference accepts). Shared by etl_import's
    dedup and etl_to_sink's sink keying so the two can't diverge."""
    cols = set(columns)
    out = []
    for tgt, src in cfg.target_pk.items():
        et = cfg.escape(tgt)
        out.append(et if et in cols else cfg.escape(src or tgt))
    return out


def range_split_stats(df: DataFrame, key_col: str, num_slices: int = 3) -> DataFrame:
    """X1 made Spark-native: the reference splits big extracts into 3
    `LIMIT offset,size` threads (PhoenixEtlService.java:264-287), which
    re-scans the prefix per slice. The scalable equivalent is disjoint
    key-range predicates (what spark.read.jdbc(partitionColumn,
    lowerBound, upperBound, numPartitions) issues). This operator
    computes the slice assignment and per-slice coverage so the split
    is itself oracle-checkable: slices are disjoint, exhaustive, and
    contiguous in key space.

    Bounds come from one tiny agg broadcast back over the scan — no
    collect, no driver loop."""
    bounds = df.agg(
        F.min(key_col).alias("__lo"), F.max(key_col).alias("__hi")
    )
    stride_den = F.col("__hi") - F.col("__lo") + 1
    # floor(double-division), not cast: Spark's bigint cast truncates
    # while DuckDB's rounds — floor agrees everywhere for positives.
    slice_id = F.least(
        F.lit(num_slices - 1).cast("bigint"),
        F.floor((F.col(key_col) - F.col("__lo")) * num_slices / stride_den),
    )
    return (
        df.join(F.broadcast(bounds))
        .groupBy(slice_id.alias("slice_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(key_col).alias("lo_key"),
            F.max(key_col).alias("hi_key"),
        )
    )


def peel_debug(params: list[object] | None) -> tuple[bool, list[object] | None]:
    """Split the `_debug` marker off the params list
    (PhoenixEtlService.java:233-236: debug = params[0]=='_debug',
    remaining params shift down)."""
    if params and params[0] == "_debug":
        return True, list(params[1:])
    return False, params


def run_etl_import(
    source: DataFrame,
    cfg: DbMapping,
    params: list[object] | None = None,
    target_schema: T.StructType | None = None,
    sink=None,
) -> dict:
    """Execute the backfill and return the reference's EtlResult
    envelope (PhoenixEtlService.java:220-307 / EtlResult fields
    succeeded/resultMessage/errorMessage): ``{"succeeded": bool,
    "rowsProcessed": int, "resultMessage": str|None, "errors": [str],
    "debug": bool}``.

    ``sink`` is a callable ``DataFrame -> rows_written`` (e.g. a
    jdbc_writer save or sinks.phoenix.write_changes wrapper); default
    counts the pipeline output — the one driver-side scalar the
    envelope requires, same as the reference's successCount."""
    debug, params = peel_debug(params)
    errors: list[str] = []
    rows = 0
    try:
        df = etl_import(source, cfg, params, target_schema)
        rows = int(sink(df)) if sink is not None else df.count()
        message = f"imported into {cfg.target_table}: {rows} rows"
    except Exception as e:  # noqa: BLE001 - envelope reports, mirror :296-299
        errors.append(f"{cfg.target_table} etl failed! ==>{e}")
        message = None
    return {
        "succeeded": not errors,
        "rowsProcessed": rows if not errors else 0,
        "resultMessage": message,
        "errors": errors,
        "debug": debug,
    }


def count_result(df: DataFrame, cfg: DbMapping) -> dict:
    """The count(task) envelope (PhoenixAdapter.java:234-252):
    ``{"succeeded": True, "count": n, "targetTable": t}``."""
    n = count_table(df).first()["cnt"]
    return {"succeeded": True, "count": int(n), "targetTable": cfg.target_table}


def count_table(df: DataFrame) -> DataFrame:
    """A1: SELECT COUNT(1) AS cnt FROM t (PhoenixAdapter.java:227),
    returned as a DataFrame so the driver can hash-check it."""
    return df.agg(F.count(F.lit(1)).alias("cnt"))


def count_filtered(df: DataFrame, cfg: DbMapping, params: list[object] | None = None) -> DataFrame:
    """A2: COUNT(1) over the conditioned extract
    (PhoenixEtlService.java:250-261)."""
    return count_table(append_condition(df, cfg, params))


def etl_to_sink(
    source: DataFrame,
    cfg: DbMapping,
    connection_factory,
    params: list[object] | None = None,
    target_schema: T.StructType | None = None,
    commit_batch: int | None = None,
    num_partitions: int | None = None,
) -> dict:
    """Full backfill EXECUTED: the etl_import pipeline shipped through
    the executor-side Phoenix write loop (executeSqlImport parity,
    PhoenixEtlService.java:404-468 — row-wise UPSERT with commitBatch
    flushes, one transaction scope per partition).

    Backfill rows are all INSERTs; seq is the per-partition arrival
    order (backfill has no cross-row ordering constraint — the PK
    dedup already happened in etl_import). Returns the EtlResult
    envelope."""
    from dataclasses import replace

    from canal_phoenix_adapter_spark.config import MappingConfig
    from canal_phoenix_adapter_spark.sinks.phoenix import write_changes

    def sink(df: DataFrame) -> int:
        # The rows reaching the sink are ALREADY target-shaped
        # (etl_import applied mapping/excludes/enums and escaped the
        # names), so the sink must see an IDENTITY mapping: re-applying
        # the original renames would emit duplicate target columns
        # bound to None, and re-applying the enum decode would corrupt
        # numeric-looking labels. target_pk re-keys to the names the
        # mapped rows ACTUALLY carry — resolved exactly like
        # etl_import's dedup (a targetPk-only rename rides through
        # mapAll under its escaped SOURCE name; keying the sink on the
        # escaped target name would crash write_changes' repartition
        # on an unresolvable column).
        sink_mapping = replace(
            cfg,
            target_columns={},
            exclude_columns=[],
            enum_columns={},
            map_all=True,
            target_pk={c: None for c in resolve_pk_columns(cfg, df.columns)},
        )
        wrapper = MappingConfig(concurrent=True, db_mapping=sink_mapping)
        # Persist so the pipeline executes ONCE for both the write and
        # the rowsProcessed count: without it the count() re-runs the
        # whole source scan + transform + dedup shuffle, and on a
        # mutable JDBC source the recount could differ from the rows
        # actually written.
        df = df.persist()
        try:
            rows = df.withColumn("op", F.lit("INSERT")).withColumn(
                "seq", F.monotonically_increasing_id()
            )
            write_changes(
                rows, wrapper, connection_factory,
                commit_batch=commit_batch or cfg.commit_batch,
                num_partitions=num_partitions,
            )
            return df.count()
        finally:
            df.unpersist()

    return run_etl_import(source, cfg, params, target_schema, sink=sink)
