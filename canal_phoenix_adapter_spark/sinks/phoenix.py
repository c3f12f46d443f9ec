"""Executor-side Phoenix/JDBC write path (BatchExecutor parity).

The reference actually executes the DML it builds: prepared
UPSERT/DELETE through a batched, transactional executor
(support/BatchExecutor.java:21-105 — lazy connection, autocommit off,
counted execute, commit/rollback), dispatched per PK-hash partition on
its own connection (service/PhoenixSyncService.java:96-132), with a
schema-heal-then-replay retry when the target lacks a table/column
(:103-131) and per-row dispatch INSERT/UPDATE->upsert (PK-change
deletes the old key first, :425-456), DELETE->delete (:473-498),
TRUNCATE->truncate (:505-513).

Spark re-expression: `write_changes` repartitions the change batch on
the PK columns (the reference's ``abs(hash(pk)) % threads`` becomes a
hash repartition — same per-key co-location guarantee, cluster-sized
instead of a hardcoded 3) and sorts within partitions by ``seq`` so
each partition applies its keys' events in order; `foreachPartition`
then drives one `BatchExecutor` per partition — Spark executors
replace the reference's thread pool, and partition granularity is the
transaction granularity exactly as in the reference.

No JDBC driver jar ships in this container, so the connection comes
from an injectable zero-arg factory returning any DB-API-shaped
object (``cursor()/commit()/rollback()/close()``). Tests inject a
recording fake; production injects `phoenixdb.connect` /
`jaydebeapi.connect` / psycopg — the loop is identical.

At 100 TB this path is the *sink*, not the compute: everything wide
(collapse, dedup, joins) has already happened in DataFrame algebra;
what ships to Python here is exactly the rows to be written, batched
per partition.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame

from canal_phoenix_adapter_spark.config import MappingConfig
from canal_phoenix_adapter_spark.operators.merge import _image_cols
from canal_phoenix_adapter_spark.operators.transform import mapping_columns
from canal_phoenix_adapter_spark.sources.jdbc import (
    delete_sql,
    quote_ident,
    truncate_sql,
    upsert_sql,
)

OP_INSERT, OP_UPDATE, OP_DELETE, OP_TRUNCATE = "INSERT", "UPDATE", "DELETE", "TRUNCATE"

#: exception class names the reference treats as heal-able
#: (PhoenixSyncService.java:105-107 endsWith checks)
_SCHEMA_ERROR_SUFFIXES = ("ColumnNotFoundException", "TableNotFoundException")


class TargetSchemaError(RuntimeError):
    """Python-side stand-in for Phoenix's ColumnNotFound/TableNotFound:
    raising it from a connection marks the failure heal-able."""


def is_schema_error(e: BaseException) -> bool:
    return isinstance(e, TargetSchemaError) or type(e).__name__.endswith(
        _SCHEMA_ERROR_SUFFIXES
    )


class BatchExecutor:
    """support/BatchExecutor.java:21-105 parity on DB-API: lazy
    connection with autocommit off, counted ``execute``, commit /
    rollback resetting the counter, idempotent close."""

    def __init__(self, connection_factory: Callable[[], Any]):
        self._factory = connection_factory
        self._conn: Any = None
        self.idx = 0  # rows executed since last commit (java :27)

    def conn(self) -> Any:
        if self._conn is None:
            self._conn = self._factory()
            try:  # autocommit off (java :37); not every DB-API exposes it
                self._conn.autocommit = False
            except AttributeError:
                pass
        return self._conn

    def execute(self, sql: str, params: list[Any]) -> None:
        cur = self.conn().cursor()
        try:
            cur.execute(sql, params)
            self.idx += 1
        finally:
            cur.close()

    def execute_update(self, sql: str) -> int:
        """Un-parameterized statement (java executeUpdate, :52-58) —
        the DDL/TRUNCATE path."""
        cur = self.conn().cursor()
        try:
            cur.execute(sql)
            return getattr(cur, "rowcount", -1)
        finally:
            cur.close()

    def commit(self) -> None:
        self.conn().commit()
        self.idx = 0

    def rollback(self) -> None:
        self.conn().rollback()
        self.idx = 0

    def close(self) -> None:
        if self._conn is not None:
            try:
                self._conn.close()
            finally:
                self._conn = None


def _check_value(cfg: MappingConfig, tgt: str, src: str, value: Any) -> Any:
    """Write-time enum decode (DbMapping.checkColumnValue,
    config/MappingConfig.java:277-287): a 1-based index into the
    column's enum list becomes its label; out-of-range or non-enum
    values pass through unchanged. The lowered lookup map is built
    once per mapping and cached on it — this runs per column per row
    in the executor apply loop, where a linear scan of enum_columns
    with repeated .lower() calls would dominate."""
    m = cfg.db_mapping
    cache = getattr(m, "_enums_lower", None)
    if cache is None:
        cache = {k.lower(): v for k, v in (m.enum_columns or {}).items()}
        try:
            m._enums_lower = cache
        except AttributeError:  # frozen dataclass: fall back to rebuild
            pass
    labels = cache.get(tgt.lower())
    if labels is None:
        labels = cache.get(src.lower())
    if labels is None or value is None:
        return value
    try:
        i = int(str(value))
    except (TypeError, ValueError):
        return value
    if i < 1 or i > len(labels):
        return value
    return labels[i - 1]


def _check_target(
    cfg: MappingConfig, tgt: str, target_columns: set[str] | None
) -> bool:
    """Reference column-presence check (PhoenixSyncService.java:399-411):
    True = write the column, False = skip it (skipMissing), raise when
    the target lacks it and skipping is not allowed."""
    if target_columns is None or tgt.lower() in target_columns:
        return True
    if cfg.db_mapping.skip_missing:
        return False
    raise TargetSchemaError(f"Target column: {tgt} not matched")


def _ci_view(item: dict) -> dict:
    """Case-insensitive view of a row dict: config-cased source names
    (explicit targetColumns / targetPk values) must match the
    DataFrame's column casing the way Spark's analyzer resolves them
    everywhere upstream — a case-sensitive item.get() silently wrote
    NULLs into every mapped column and made DELETE predicates match
    nothing (r10 review). Two source columns differing only by case
    would collapse to whichever iterates last — raise instead of
    writing arbitrary values (r10 ADVICE)."""
    view = {k.lower(): v for k, v in item.items()}
    if len(view) != len(item):
        clash = sorted(k for k in item if sum(j.lower() == k.lower() for j in item) > 1)
        raise ValueError(f"columns collide case-insensitively: {clash}")
    return view


def upsert_item(
    executor: BatchExecutor,
    cfg: MappingConfig,
    item: dict,
    target_columns: set[str] | None = None,
    seq_col: str = "seq",
    op_col: str = "op",
    old_prefix: str = "old_",
) -> None:
    """INSERT/UPDATE apply (PhoenixSyncService.insert, :370-468): build
    the UPSERT column list through the mapping (skipMissing columns
    dropped, missing ones fatal otherwise), and when the event moved
    the row's PK, DELETE the old key first (:425-456) — order matters
    and is asserted by tests."""
    m = cfg.db_mapping
    # merge._image_cols, not a local copy: a re-implementation here
    # once drifted by the is_ddl exclusion (IS_DDL in every UPSERT)
    colmap = mapping_columns(
        m, _image_cols(list(item), m.pk_source_columns(), seq_col, op_col,
                       old_prefix)
    )
    low = _ci_view(item)
    cols: list[str] = []
    vals: list[Any] = []
    for tgt, src in colmap.items():
        if not _check_target(cfg, m.escape(tgt), target_columns):
            continue
        cols.append(tgt)
        vals.append(_check_value(cfg, tgt, src, low.get(src.lower())))

    key_changed = False
    del_vals: list[Any] = []
    for tgt, src in m.target_pk.items():
        pk_src = src or tgt
        old_val = low.get((old_prefix + pk_src).lower())
        if old_val is not None and old_val != low.get(pk_src.lower()):
            key_changed = True
        # enum decode applies to PK PREDICATES too (reference runs
        # checkColumnValue inside getPkVal, PhoenixSyncService.java:
        # 589): an enum-typed PK stores the decoded LABEL, so a raw
        # index in the DELETE predicate would never match.
        del_vals.append(
            _check_value(
                cfg, tgt, pk_src,
                old_val if old_val is not None else low.get(pk_src.lower()),
            )
        )
    if key_changed:
        executor.execute(delete_sql(m), del_vals)
    executor.execute(upsert_sql(m, [m.escape(c) for c in cols]), vals)


def delete_item(
    executor: BatchExecutor,
    cfg: MappingConfig,
    item: dict,
) -> None:
    """DELETE apply (PhoenixSyncService.delete, :473-498): PK-equality
    predicate from the row image (composite PKs supported), values
    through the enum decode like every other PK predicate
    (checkColumnValue in getPkVal, PhoenixSyncService.java:589)."""
    m = cfg.db_mapping
    low = _ci_view(item)
    vals = [
        _check_value(cfg, tgt, src or tgt, low.get((src or tgt).lower()))
        for tgt, src in m.target_pk.items()
    ]
    executor.execute(delete_sql(m), vals)


def sync_item(
    executor: BatchExecutor,
    cfg: MappingConfig,
    item: dict,
    target_columns: set[str] | None = None,
    seq_col: str = "seq",
    op_col: str = "op",
    old_prefix: str = "old_",
) -> None:
    """Per-row dispatch (PhoenixSyncService.java:234-254): INSERT and
    UPDATE both route to upsert (Phoenix UPSERT is idempotent on the
    PK), DELETE/TRUNCATE to their statements; unrecognized types are
    ignored exactly like the reference's else-branch."""
    op = (item.get(op_col) or "").upper()
    if op in (OP_INSERT, OP_UPDATE):
        upsert_item(executor, cfg, item, target_columns, seq_col, op_col, old_prefix)
    elif op == OP_DELETE:
        delete_item(executor, cfg, item)
    elif op == OP_TRUNCATE:
        executor.execute(truncate_sql(cfg.db_mapping), [])


def apply_partition(
    rows: Iterable[Any],
    cfg: MappingConfig,
    connection_factory: Callable[[], Any],
    target_columns: set[str] | None = None,
    seq_col: str = "seq",
    op_col: str = "op",
    old_prefix: str = "old_",
    commit_batch: int | None = None,
    heal: Callable[[Any], bool] | None = None,
) -> int:
    """The per-partition transactional apply loop
    (PhoenixSyncService.java:96-132): apply every item in order,
    commit; on failure roll back, and if the failure is a heal-able
    schema error and a ``heal`` hook is provided (the reference calls
    PhoenixEtlService.syncSchema), heal then REPLAY the whole
    partition once and commit — second failure rolls back and raises.

    ``commit_batch`` additionally commits every N executed statements
    (the ETL import's commitBatch flush, PhoenixEtlService.java:448;
    config/MappingConfig.java:116). Returns the number of ITEMS
    applied — a PK-change item executes two statements (DELETE +
    UPSERT), so this is not a statement count (BatchExecutor.idx
    tracks statements for the commit threshold).

    The items are buffered in a list because the heal path replays
    them — partition size is the caller's batching decision, exactly
    as the reference buffers its per-thread dmlsPartition lists.
    """
    items = [r.asDict() if hasattr(r, "asDict") else dict(r) for r in rows]
    if not items:
        return 0
    executor = BatchExecutor(connection_factory)
    tcols = {c.lower() for c in target_columns} if target_columns is not None else None
    executed = 0

    def apply_all(allow_flush: bool = True) -> int:
        n = 0
        for item in items:
            sync_item(executor, cfg, item, tcols, seq_col, op_col, old_prefix)
            n += 1
            if allow_flush and commit_batch and executor.idx >= commit_batch:
                executor.commit()
        return n

    try:
        try:
            executed = apply_all()
            executor.commit()
        except Exception as e:  # noqa: BLE001 - mirror reference catch-all
            executor.rollback()
            if not is_schema_error(e) or heal is None or not heal(executor.conn()):
                raise
            # heal succeeded: replay once (java :118-127). The whole
            # replay — statements AND final commit — rolls back on any
            # failure, so commit_batch flushes are SUPPRESSED during
            # the replay: a mid-replay commit would persist a prefix
            # (including any TRUNCATE in it) past the final
            # rollback-and-raise, silently breaking the documented
            # second-failure contract (r10 review). A replayed
            # partition is one transaction. Guarding only the commit
            # would also close the
            # connection with an open transaction when a replayed
            # STATEMENT raises (the documented second-failure contract
            # is rollback-and-raise).
            try:
                executed = apply_all(allow_flush=False)
                executor.commit()
            except Exception:
                executor.rollback()
                raise
    finally:
        executor.close()
    return executed


def write_changes(
    df: DataFrame,
    cfg: MappingConfig,
    connection_factory: Callable[[], Any],
    target_columns: set[str] | None = None,
    num_partitions: int | None = None,
    seq_col: str = "seq",
    op_col: str = "op",
    old_prefix: str = "old_",
    commit_batch: int | None = None,
    heal: Callable[[Any], bool] | None = None,
) -> None:
    """Distributed sink entry point: hash-partition the change batch on
    its PK source columns (per-key ordered parallelism C8 — every
    event for one key lands in one partition, the reference's
    ``pkHash`` at PhoenixSyncService.java:609-628), order each
    partition by ``seq``, and run :func:`apply_partition` per
    partition via ``foreachPartition``.

    ``cfg.concurrent=False`` (C9, MappingConfig.java:17 default)
    collapses to ONE partition — the reference's hash=0 serial mode.

    Ordering caveat, inherited REFERENCE semantics: the partition key
    is the NEW-image PK, so a PK-change's old-key DELETE executes in
    the new key's partition (exactly like the reference, whose
    pkHash at PhoenixSyncService.java:609-628 also hashes the data
    image while the delete targets the old key), and a TRUNCATE row
    (null PKs) lands in one arbitrary partition. Cross-partition
    commit order is unordered, so a same-batch event on the OLD key
    in another partition races the delete. The reference accepts
    this; pipelines that need strict cross-key ordering for such
    batches use ``concurrent=False`` — or the merge kernel
    (operators/merge.py), whose collapse resolves old-key deaths and
    truncate cuts by sequence before anything is applied.

    ``connection_factory`` must be picklable (module-level function or
    closure); it runs on executors, one connection per partition.
    """
    m = cfg.db_mapping
    pk_src = m.pk_source_columns()
    if cfg.concurrent and pk_src:
        n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
        parted = df.repartition(n, *pk_src)
    else:
        parted = df.repartition(1)
    parted = parted.sortWithinPartitions(seq_col)
    parted.foreachPartition(
        lambda rows: apply_partition(
            rows, cfg, connection_factory, target_columns,
            seq_col, op_col, old_prefix, commit_batch, heal,
        )
    )
