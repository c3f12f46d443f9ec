"""Structured Streaming wrapper over the batch CDC kernel.

The reference's sync(List<Dml>) hot path (PhoenixAdapter.java:143-152
-> PhoenixSyncService.java:157-225) maps onto a Structured Streaming
micro-batch: route -> explode -> transform -> merge_cdc per epoch in
foreachBatch; the reference's futures-join barrier (:134-140) is the
epoch commit, and its transactional batch + rollback (C10,
BatchExecutor.java:60-91) is the epoch's atomicity + idempotent-merge
replay (Structured Streaming's prefix-integrity model — SURVEY §7.1 M5).

State backend here is versioned parquet snapshots (simple, testable,
lake-friendly). On a production deployment the same foreachBatch body
targets Delta MERGE or a Phoenix/JDBC sink; merge_cdc is the part
that doesn't change.
"""

from __future__ import annotations

import json
import os
from contextlib import contextmanager
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from canal_phoenix_adapter_spark.config import MappingConfig
from canal_phoenix_adapter_spark.operators.merge import (
    _NO_PRESCAN,
    merge_cdc,
    old_key_exprs,
    truncate_seq_expr,
)
from canal_phoenix_adapter_spark.sources.events import (
    DML_ENVELOPE,
    explode_dml,
    parse_dml_json,
    route,
)


class _CommitPointer:
    """The commit-marker contract shared by the state stores: a
    ``_CURRENT`` pointer file ({"version": int, "epoch": int|None}
    json, swapped into place with an atomic os.replace) plus a
    ``_COMMITLOCK`` advisory lock serializing commits.

    The lock is an ``fcntl.flock``: owned by the open file
    description, so it auto-releases when the holder's process dies
    (no stale-lock janitor), and it excludes both other threads of
    this process and other processes on the same host filesystem.
    It is NOT reentrant — ``write()`` takes it, so code that already
    holds ``commit_lock()`` must call ``_write_unlocked()``.

    Why commits must serialize: every writer's snapshot is derived
    from the version it read (its BASIS). Two concurrent commits —
    e.g. a CDC epoch and an erase_keys compliance deletion — are a
    check-then-act race: the second pointer swap publishes a snapshot
    computed WITHOUT the first commit's changes, silently undoing a
    committed epoch (or the erasure). Holding the lock across
    [basis read -> snapshot write -> pointer swap] makes the basis
    valid at publish time by construction. Requires ``self._meta_dir``
    (directory holding the pointer and lock files)."""

    _meta_dir: str

    def _pointer(self) -> str:
        return os.path.join(self._meta_dir, "_CURRENT")

    @contextmanager
    def commit_lock(self):
        import fcntl

        with open(os.path.join(self._meta_dir, "_COMMITLOCK"), "a") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)

    def current_version(self) -> int | None:
        try:
            with open(self._pointer(), encoding="utf-8") as f:
                return int(json.load(f)["version"])
        except (FileNotFoundError, ValueError, KeyError):
            return None

    def last_epoch(self) -> int | None:
        """Last CDC epoch id committed via apply_cdc_epoch — the replay
        skip watermark. Falls back to the version for old-layout
        pointers (written before the two counters were separated)."""
        try:
            with open(self._pointer(), encoding="utf-8") as f:
                p = json.load(f)
        except (FileNotFoundError, ValueError):
            return None
        e = p.get("epoch", p.get("version"))
        return None if e is None else int(e)

    def _repoint(self, version: int, epoch_id: int | None) -> None:
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"version": version, "epoch": epoch_id}, f)
        os.replace(tmp, self._pointer())

    def _merge_commit_unlocked(
        self,
        batch_df: DataFrame,
        pk: list[str],
        version: int,
        epoch_id: int,
    ) -> tuple[DataFrame, set[str] | None]:
        """The store's epoch-commit strategy, called by
        apply_cdc_epoch UNDER the commit lock; owns the basis READ as
        well as the write (the pruned store must never pay a
        full-state read for a bucket-local epoch). Default:
        full-snapshot read-merge-rewrite. Returns (new state, prior
        lowercase column set or None) for the schema-change hook — or
        (None, None) for an empty batch: the store owns the emptiness
        check because the pruned store learns it for free from its
        pre-scan (a separate isEmpty() was one redundant job/epoch).

        The plain store's pre-scan mirrors the pruned one at smaller
        width: ONE aggregation job yields both the emptiness check and
        the TRUNCATE seq (r14 — previously isEmpty() + merge_cdc's
        truncate re-scan cost two jobs per epoch over the same batch;
        assumes apply_cdc_epoch's seq/op column contract, like
        PrunedParquetStateStore._scan_batch)."""
        row = batch_df.agg(
            F.count(F.lit(1)).alias("n"),
            truncate_seq_expr("seq", "op").alias("tr"),
        ).first()
        if row["n"] == 0:
            return None, None
        return self._merge_commit_nonempty(
            batch_df, pk, version, epoch_id, trunc_seq=row["tr"]
        )

    def _merge_commit_nonempty(
        self, batch_df: DataFrame, pk: list[str], version: int, epoch_id: int,
        trunc_seq: object = _NO_PRESCAN, broadcast_changes: bool = True,
    ) -> tuple[DataFrame, set[str] | None]:
        """Full-snapshot read-merge-rewrite for a batch the caller has
        PROVEN non-empty — the pruned store's TRUNCATE and heal/DDL
        fallbacks enter here so neither the pre-scan's count nor its
        truncate seq is re-derived with extra jobs per fallback epoch
        (``trunc_seq`` forwards the pre-scan result to merge_cdc).

        ``broadcast_changes`` default True: the PLAIN store has no
        pre-scan row count and assumes micro-batch-sized changes (its
        documented operating envelope); the pruned store's fallback
        paths forward their measured heuristic so a backfill-sized
        TRUNCATE/heal epoch does not pin millions of touched keys in
        every executor (r10 review)."""
        state = self.read()
        prev_cols = None if state is None else {c.lower() for c in state.columns}
        new_state = merge_cdc(state, batch_df, pk, old_prefix="old_",
                              known_trunc_seq=trunc_seq,
                              broadcast_changes=broadcast_changes)
        self._write_unlocked(new_state, version, epoch_id=epoch_id)
        return new_state, prev_cols


def _as_nullable(dt: T.DataType) -> T.DataType:
    """Schema with every field/element marked nullable — what parquet
    footer inference would report (footers carry no non-null
    guarantee), so a write-plan schema can seed the read-path memo
    without leaking a false non-null promise from literals/counts."""
    if isinstance(dt, T.StructType):
        return T.StructType([
            T.StructField(f.name, _as_nullable(f.dataType), True, f.metadata)
            for f in dt.fields
        ])
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_as_nullable(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(_as_nullable(dt.keyType), _as_nullable(dt.valueType),
                         True)
    return dt


class ParquetStateStore(_CommitPointer):
    """Versioned keyed-state table on parquet: each epoch writes a new
    snapshot dir and repoints _CURRENT (atomic rename of a small
    pointer file), so readers never see a half-written snapshot.

    The _CURRENT repoint IS the epoch's commit marker (C10 atomicity):
      * crash before the repoint -> _CURRENT still names the previous
        version; the replayed epoch reads it and overwrites the
        orphaned v{N} dir (a different path than the one being read).
      * crash after the repoint but before the streaming checkpoint
        commits -> the replayed epoch sees last_epoch() == its
        epoch_id and must SKIP the merge (apply_cdc_epoch does);
        re-merging would both double-apply and self-overwrite the
        v{N} dir it is lazily reading from, which Spark rejects
        ("Cannot overwrite a path that is also being read from").
    write() therefore must never target the version its input was read
    from — callers route through apply_cdc_epoch, which guarantees it.

    Commits are serialized under the inherited commit lock (see
    _CommitPointer: flock held across basis read -> snapshot write ->
    pointer swap), so a concurrent admin commit can never publish
    over — or be published over by — an epoch it did not observe.

    Snapshot VERSION and CDC EPOCH are separate counters: the pointer
    records both. A non-CDC commit (erase_keys compliance deletion)
    bumps only the version and carries the epoch watermark forward —
    so it can neither shadow a future epoch in the replay check nor
    collide with a future epoch's snapshot dir (apply_cdc_epoch writes
    version max(cur+1, epoch_id)). Old-layout pointers without the
    "epoch" key fall back to epoch == version (those stores were only
    ever written by apply_cdc_epoch, where the two coincided)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._meta_dir = path
        # (version, all-nullable schema) of the last snapshot this
        # handle wrote or inferred — committed snapshots are immutable
        # (orphan overwrite only targets versions above _CURRENT), so
        # the next epoch's basis read can skip parquet footer
        # inference (one driver-side FS round-trip per epoch; r14).
        # All-nullable mirrors what inference would return — parquet
        # footers carry no non-null guarantee — so a write-plan schema
        # with non-nullable fields (literals, count()s) can never leak
        # a false non-null promise into the read path.
        self._schema_memo: tuple[int, T.StructType] | None = None
        os.makedirs(path, exist_ok=True)

    def _refuse_pruned_layout(self, version: int) -> None:
        """A plain handle over a pruned-store path would read ONLY the
        latest version's touched-bucket dirs (plus a __bucket partition
        column) as if they were full state, then commit that truncated
        state forward — silent data loss. The manifest file is the
        layout marker; refuse loudly instead."""
        if os.path.isfile(
            os.path.join(self.path, f"v{version}", "_manifest.json")
        ):
            raise ValueError(
                f"{self.path} v{version} carries _manifest.json: this is a "
                "PrunedParquetStateStore layout; open it with "
                "PrunedParquetStateStore (matching pk and n_buckets), not "
                "the plain ParquetStateStore"
            )

    def read(self) -> DataFrame | None:
        v = self.current_version()
        if v is None:
            return None
        self._refuse_pruned_layout(v)
        path = os.path.join(self.path, f"v{v}")
        if self._schema_memo is not None and self._schema_memo[0] == v:
            return self.spark.read.schema(self._schema_memo[1]).parquet(path)
        df = self.spark.read.parquet(path)
        self._schema_memo = (v, df.schema)
        return df

    def _raise_not_retained(self, version: int, cur: int | None) -> None:
        committed = [v for v in self.versions() if cur is not None and v <= cur]
        raise FileNotFoundError(
            f"state version {version} not committed+retained "
            f"(current={cur}); retained committed versions: {committed}"
        )

    def read_version(self, version: int) -> DataFrame:
        """Time travel: read a specific retained snapshot (committed
        epochs within the `prune` retention window). Raises if the
        snapshot was pruned or never COMMITTED — a vN dir newer than
        _CURRENT is a mid-crash orphan (possibly half-written, and the
        replay's overwrite target), not a readable snapshot."""
        cur = self.current_version()
        p = os.path.join(self.path, f"v{version}")
        if cur is None or version > cur or not os.path.isdir(p):
            self._raise_not_retained(version, cur)
        self._refuse_pruned_layout(version)
        return self.spark.read.parquet(p)

    def write(self, df: DataFrame, version: int, epoch_id: int | None = None) -> None:
        """Commit ``df`` as snapshot ``version``, serialized under the
        commit lock. ``epoch_id`` (CDC writes only) advances the replay
        watermark; a None epoch_id (bootstrap / erasure) carries the
        current watermark forward. Callers that already hold
        ``commit_lock()`` (and therefore own a validated basis) must
        use ``_write_unlocked`` — the flock is not reentrant."""
        with self.commit_lock():
            self._write_unlocked(df, version, epoch_id)

    def _write_unlocked(
        self, df: DataFrame, version: int, epoch_id: int | None = None
    ) -> None:
        cur = self.current_version()
        if cur is not None:
            # a plain handle publishing over a pruned layout would
            # repoint to a manifest-less snapshot, stranding every
            # pruned reader — refuse like read()/prune() do (the pruned
            # subclass overrides this method, so its own writes pass)
            self._refuse_pruned_layout(cur)
        if epoch_id is None:
            epoch_id = self.last_epoch()
        target = os.path.join(self.path, f"v{version}")
        df.write.mode("overwrite").parquet(target)
        schema = _as_nullable(df.schema)
        assert isinstance(schema, T.StructType)
        self._schema_memo = (version, schema)
        self._repoint(version, epoch_id)

    def versions(self) -> list[int]:
        """Snapshot versions on disk, ascending. Negative versions are
        legal (the etl-then-sync bootstrap commits the backfill as a
        version below any streaming epoch id, e.g. -1) and must be
        visible here or prune() would retain the full-backfill
        snapshot — the largest in the store — forever."""
        out = []
        try:
            for name in os.listdir(self.path):
                if name.startswith("v"):
                    try:
                        out.append(int(name[1:]))
                    except ValueError:
                        continue
        except FileNotFoundError:
            pass
        return sorted(out)

    def prune(self, keep_last: int = 2) -> list[int]:
        """Retention GC: drop snapshot dirs older than the newest
        ``keep_last`` COMMITTED versions (a long-running stream writes
        one snapshot per epoch — without pruning, state size x epochs
        accumulates forever). Never drops the _CURRENT version or
        anything newer than it (an orphan from a mid-crash epoch is
        the replay's write target, stream.py:37-54 contract). Returns
        the pruned versions. Call it from foreachBatch cadence or a
        janitor cron; it only touches strictly-older snapshot dirs, so
        it is safe concurrent with readers of _CURRENT."""
        import shutil

        cur = self.current_version()
        if cur is None:
            return []
        # a pruned manifest maps buckets to OLDER versions' dirs;
        # rmtree'ing those would destroy live state — refuse like read()
        self._refuse_pruned_layout(cur)
        keep_last = max(1, keep_last)
        committed = [v for v in self.versions() if v <= cur]
        doomed = committed[:-keep_last] if len(committed) > keep_last else []
        for v in doomed:
            shutil.rmtree(os.path.join(self.path, f"v{v}"), ignore_errors=True)
        return doomed


class PrunedParquetStateStore(ParquetStateStore):
    """ParquetStateStore variant whose epoch commit is O(touched
    buckets), not O(state) — the r4 verdict's one remaining 100 TB
    scale-killer (the reference's JDBC sink only ever writes changed
    rows, support/BatchExecutor.java:60-75; the full-snapshot rewrite
    per epoch had no analogue there). Cost model + measurements:
    SCALE.md round-5 section / tools/epoch_smoke.py.

    Layout: state hash-bucketed on the PK; a version dir holds
    ``__bucket=K`` parquet dirs for ONLY the buckets its epoch
    rewrote, plus ``_manifest.json`` mapping EVERY bucket to its
    owning version (and the state schema). Reads assemble explicit
    paths from the manifest (no partition discovery, no footer
    inference); an epoch collects its touched buckets (≤ n_buckets
    ints), merges only those dirs, writes them + a new manifest whose
    untouched entries keep their old owners. With batch keys ≪ state
    keys, per-epoch I/O is ~constant as state grows. (An earlier
    hardlink-forward design paid O(n_buckets) links/epoch — dominant
    past ~1k buckets — and has no object-store analogue; manifests
    are the Delta/Iceberg move.)

    TRUNCATE and schema-changing heal/DDL epochs fall back to the
    full rewrite (they cannot be bucket-local; one schema per
    manifest keeps reads merge-free). Crash-safety is the inherited
    pointer contract: static overwrite clears a crashed attempt's
    orphan (stale manifest included), the manifest lands before the
    repoint, replayed committed epochs no-op on the watermark.
    ``prune`` GCs bucket dirs by refcount across RETAINED manifests,
    so time travel within retention survives dir sharing."""

    BUCKET = "__bucket"
    MANIFEST = "_manifest.json"

    def __init__(self, spark: SparkSession, path: str, pk: list[str],
                 n_buckets: int = 64,
                 broadcast_threshold_rows: int = 2_000_000):
        super().__init__(spark, path)
        self.pk = list(pk)
        self.n_buckets = n_buckets
        # Merge-route cutover: at or below the threshold the collapsed
        # touched-key set is broadcast (state never shuffles — the
        # normal CDC case); above it the merge runs broadcast-free —
        # a backfill-sized epoch must not pin the key set in every
        # executor (the reference's apply cost never depends on batch
        # size beyond rows written, support/BatchExecutor.java:60-75).
        # Rows, not distinct keys: the pre-scan yields it for free.
        self.broadcast_threshold_rows = broadcast_threshold_rows
        self._manifest_cache: dict[int, dict] = {}

    def _bucket_of(self, key_cols: list) -> F.Column:
        # hash() is seed-stable Murmur3 and NULL-accepting, so a key's
        # bucket is identical across epochs and versions by construction
        return F.pmod(F.hash(*key_cols), F.lit(self.n_buckets))

    def _repoint(self, version: int, epoch_id: int | None) -> None:
        # a replayed orphan overwrite rewrites THIS version's manifest
        # in place — drop any cached copy before publishing
        self._manifest_cache.pop(version, None)
        super()._repoint(version, epoch_id)

    # -- manifest bookkeeping ------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, f"v{version}", self.MANIFEST)

    def _manifest(self, version: int) -> dict:
        """{"schema": StructType-json, "buckets": {bucket_id: owner
        version}} for a COMMITTED version. Memoized: committed
        manifests are immutable (orphan overwrite only targets
        versions above _CURRENT)."""
        m = self._manifest_cache.get(version)
        if m is None:
            try:
                with open(self._manifest_path(version), encoding="utf-8") as f:
                    raw = json.load(f)
            except FileNotFoundError:
                # the layout-mismatch twin of _refuse_pruned_layout: a
                # pruned handle opened over a plain ParquetStateStore
                # path (e.g. state_buckets flipped on on an existing
                # deployment) must fail with a migration message, not a
                # raw FileNotFoundError mid-epoch
                raise ValueError(
                    f"{self.path} v{version} has no _manifest.json: this "
                    "is a plain ParquetStateStore layout; open it with "
                    "ParquetStateStore, or migrate by reading the plain "
                    "store and bootstrap-writing a fresh "
                    "PrunedParquetStateStore path"
                ) from None
            m = {
                "schema": raw["schema"],
                "n_buckets": int(raw.get("n_buckets", self.n_buckets)),
                "buckets": {int(k): int(v) for k, v in raw["buckets"].items()},
            }
            if len(self._manifest_cache) > 8:
                self._manifest_cache.clear()
            self._manifest_cache[version] = m
        return m

    def _check_modulus(self, manifest: dict) -> None:
        """Guard for BUCKET-LOCAL operations (pruned merge, pruned
        erasure): a handle whose n_buckets differs from the manifest's
        would compute touched-bucket ids that miss the on-disk dirs
        entirely — keys would read as absent and epochs would
        silently duplicate them. Reads and full-rewrite fallbacks are
        modulus-agnostic (dirs come from the manifest; a full rewrite
        re-buckets consistently and records its own modulus), so the
        check lives only on the dangerous paths. ``rebucket``
        migrates deliberately."""
        if manifest["n_buckets"] != self.n_buckets:
            raise ValueError(
                f"store was written with n_buckets={manifest['n_buckets']} "
                f"but this handle uses {self.n_buckets}; open it with the "
                "stored bucket count or migrate via rebucket()"
            )

    def _write_manifest(
        self, version: int, schema: T.StructType, buckets: dict[int, int]
    ) -> None:
        tmp = self._manifest_path(version) + ".tmp"
        os.makedirs(os.path.dirname(tmp), exist_ok=True)
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(
                {"schema": schema.jsonValue(),
                 "n_buckets": self.n_buckets,
                 "buckets": {str(k): v for k, v in buckets.items()}},
                f,
            )
        os.replace(tmp, self._manifest_path(version))

    def rebucket(self, n_buckets: int) -> int:
        """Migrate the store to a new bucket count (state grew past
        the sizing rule's target bucket size): one full rewrite
        committed as a new version under the commit lock, watermark
        carried. Readers of prior versions keep the old modulus (each
        manifest records its own). Returns the new version id."""
        with self.commit_lock():
            cur = self.current_version()
            if cur is None:
                raise ValueError("no committed state to rebucket")
            state = self.read()
            old_n = self.n_buckets
            # restore the old modulus if the rewrite fails mid-flight:
            # the store still holds the old layout, and a handle left
            # on the new modulus would fail every subsequent
            # bucket-local epoch's modulus guard until restart
            self.n_buckets = n_buckets
            try:
                self._write_unlocked(state, cur + 1, epoch_id=None)
            except BaseException:
                self.n_buckets = old_n
                raise
        return cur + 1

    def _schema_of(self, manifest: dict) -> T.StructType:
        return T.StructType.fromJson(manifest["schema"])

    def _bucket_dir(self, owner: int, bucket: int) -> str:
        return os.path.join(self.path, f"v{owner}", f"{self.BUCKET}={bucket}")

    def _owned_buckets(self, version: int) -> dict[int, int]:
        """Buckets whose data dir a version's own directory holds."""
        vdir = os.path.join(self.path, f"v{version}")
        out = {}
        prefix = self.BUCKET + "="
        try:
            names = os.listdir(vdir)
        except FileNotFoundError:
            return out
        for n in names:
            if n.startswith(prefix):
                try:
                    out[int(n[len(prefix):])] = version
                except ValueError:
                    continue
        return out

    # -- reads ---------------------------------------------------------------

    def _read_buckets(self, manifest: dict, buckets=None) -> DataFrame:
        """Assemble a DataFrame from explicit bucket-dir paths (all
        buckets, or a subset) with the manifest's schema — never a
        partition discovery over the version dir."""
        entries = manifest["buckets"]
        if buckets is not None:
            entries = {b: o for b, o in entries.items() if b in buckets}
        dirs = [self._bucket_dir(o, b) for b, o in sorted(entries.items())]
        schema = self._schema_of(manifest)
        if not dirs:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*dirs)

    def read(self) -> DataFrame | None:
        v = self.current_version()
        return None if v is None else self._read_buckets(self._manifest(v))

    def read_version(self, version: int) -> DataFrame:
        cur = self.current_version()
        if cur is None or version > cur or not os.path.isfile(
            self._manifest_path(version)
        ):
            self._raise_not_retained(version, cur)
        return self._read_buckets(self._manifest(version))

    # -- writes --------------------------------------------------------------

    def _write_unlocked(
        self, df: DataFrame, version: int, epoch_id: int | None = None
    ) -> None:
        """Full rewrite — bootstrap, erasure, and the TRUNCATE/
        schema-change fallbacks land here: the new version owns every
        surviving bucket."""
        cur = self.current_version()
        if cur is not None:
            # publish-direction twin of the plain store's guard: over a
            # plain layout _manifest raises the migration error —
            # silently publishing would make the next prune() sweep
            # every manifest-less plain snapshot dir as unreferenced
            self._manifest(cur)
        if epoch_id is None:
            epoch_id = self.last_epoch()
        if self.BUCKET in df.columns:
            raise ValueError(f"state may not carry a {self.BUCKET} column")
        self._write_bucket_dirs(df, version)
        self._write_manifest(version, df.schema, self._owned_buckets(version))
        self._repoint(version, epoch_id)

    def _write_bucket_dirs(
        self, df: DataFrame, version: int, n_parts: int | None = None
    ) -> None:
        """Write ``df`` hash-clustered into ``__bucket=K`` dirs under
        the version dir (static overwrite clears a crashed attempt's
        orphan first). The bucket-column repartition is load-bearing:
        without it every write task emits a file into every bucket dir
        it holds rows for — O(tasks x buckets) tiny files per version,
        measured 4-5x the whole epoch wall. ``n_parts`` sizes that
        shuffle (the pruned merge passes |touched|: n_buckets tasks
        for a 200-bucket epoch is pure scheduler overhead, and the
        earlier 2x slack measurably bought nothing — SCALE.md r6).
        The count stays PINNED (REPARTITION_BY_NUM): the r14
        optimization pass measured the AQE-coalescible column-only
        form at +20% per drive (interleaved A/B, bands 26.1-30.3s vs
        21.7-24.4s) — the extra AQE stage round-trip per epoch costs
        more than |touched| tiny parallel tasks save."""
        target = os.path.join(self.path, f"v{version}")
        # Sort key is (__bucket, *pk), NOT bare pk: the V1 write path
        # requires its output ordered by the partition column and
        # inserts its own Sort(__bucket) when the child ordering does
        # not satisfy it — under which the optimizer ELIMINATED a bare
        # pk sort as redundant, so files were written in arbitrary pk
        # order (verified on-disk, r15: 32/32 bucket dirs unsorted).
        # Prefixing the bucket satisfies the writer's requirement (no
        # second sort is inserted) and makes the pk-clustered layout —
        # parquet min/max row-group skipping on key lookups — actually
        # materialize. Same sort count, strictly better file layout.
        (
            df.withColumn(self.BUCKET, self._bucket_of([F.col(k) for k in self.pk]))
            .repartition(n_parts or self.n_buckets, F.col(self.BUCKET))
            .sortWithinPartitions(self.BUCKET, *self.pk)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy(self.BUCKET)
            .parquet(target)
        )

    def _scan_batch(
        self, batch_df: DataFrame, pk: list[str]
    ) -> tuple[list[int], int | None, int]:
        """ONE aggregation job over the change batch returning
        (touched buckets, last TRUNCATE seq or None, batch row
        count). Touched = every row's NEW key bucket plus PK-change
        rows' OLD key bucket (the death row lands there — same
        coalesce(old, new) key as collapse_changes). Folding the
        TRUNCATE pre-scan, the emptiness check (count == 0) and the
        broadcast-heuristic row count into the same pass keeps the
        pre-scan at one job/epoch; assumes apply_cdc_epoch's seq/op
        column contract."""
        # truncate_seq_expr / old_key_exprs come from merge.py — the
        # pre-scan is AUTHORITATIVE (check_truncate=False downstream),
        # so a hand-maintained copy drifting from collapse_changes
        # would be unguarded (r10 review)
        aggs = [
            F.collect_set(
                self._bucket_of([F.col(k) for k in pk])
            ).alias("nb"),
            truncate_seq_expr("seq", "op").alias("tr"),
            F.count(F.lit(1)).alias("n"),
        ]
        if any(f"old_{k}" in batch_df.columns for k in pk):
            old_key = old_key_exprs(batch_df.columns, pk, "old_")
            aggs.append(F.collect_set(self._bucket_of(old_key)).alias("ob"))
        row = batch_df.agg(*aggs).first()
        touched = set(row["nb"]) | set(row["ob"] if "ob" in row.__fields__ else [])
        return sorted(touched), row["tr"], row["n"]

    def _merge_commit_unlocked(
        self,
        batch_df: DataFrame,
        pk: list[str],
        version: int,
        epoch_id: int,
    ) -> tuple[DataFrame, set[str] | None]:
        if [k.lower() for k in pk] != [k.lower() for k in self.pk]:
            raise ValueError(
                f"epoch pk {pk} != store bucketing pk {self.pk}: a "
                "mismatched key would scatter rows across wrong buckets"
            )
        cur = self.current_version()
        if cur is None:  # bootstrap: full write owns every bucket
            return super()._merge_commit_unlocked(
                batch_df, pk, version, epoch_id
            )
        touched, trunc_seq, n_rows = self._scan_batch(batch_df, pk)
        if n_rows == 0:  # empty epoch: nothing to commit
            return None, None
        if trunc_seq is not None:
            # TRUNCATE: every bucket changes anyway; the pre-scan
            # already proved the batch non-empty AND found the truncate
            # seq, so skip both the isEmpty() job and the re-scan
            return super()._merge_commit_nonempty(
                batch_df, pk, version, epoch_id, trunc_seq=trunc_seq,
                broadcast_changes=n_rows <= self.broadcast_threshold_rows,
            )
        manifest = self._manifest(cur)
        self._check_modulus(manifest)
        prev_schema = self._schema_of(manifest)
        prev_cols = {f.name.lower() for f in prev_schema.fields}
        touched_state = self._read_buckets(manifest, set(touched))
        # check_truncate=False: the TRUNCATE pre-scan already ran above
        # (it routed to the full-rewrite fallback) — re-scanning inside
        # merge_cdc would cost one more job per epoch for nothing
        merged = merge_cdc(
            touched_state, batch_df, pk, old_prefix="old_",
            check_truncate=False,
            broadcast_changes=n_rows <= self.broadcast_threshold_rows,
        )
        prev_fields = {(f.name.lower(), f.dataType) for f in prev_schema.fields}
        new_fields = {(f.name.lower(), f.dataType) for f in merged.schema.fields}
        if prev_fields != new_fields:
            # heal/DDL epoch: rewrite all buckets onto the new schema
            # (non-empty and no-TRUNCATE already proven by the pre-scan)
            return super()._merge_commit_nonempty(
                batch_df, pk, version, epoch_id, trunc_seq=None,
                broadcast_changes=n_rows <= self.broadcast_threshold_rows,
            )
        self._commit_touched(merged, version, manifest, set(touched),
                             merged.schema, epoch_id)
        return merged, prev_cols

    def _commit_touched(self, df: DataFrame, version: int, manifest: dict,
                        touched: set, schema, epoch_id) -> None:
        """Bucket-local commit shared by the pruned merge and the
        pruned erasure: write only the touched buckets (write tasks
        sized to |touched|), publish a manifest where touched buckets
        that survived point at this version, touched buckets with no
        survivors drop out, and untouched buckets keep their current
        owner; then repoint."""
        self._write_bucket_dirs(
            df, version, n_parts=min(self.n_buckets, max(1, len(touched)))
        )
        buckets = {
            b: o for b, o in manifest["buckets"].items() if b not in touched
        }
        buckets.update(self._owned_buckets(version))
        self._write_manifest(version, schema, buckets)
        self._repoint(version, epoch_id)

    # -- retention -----------------------------------------------------------

    def versions(self) -> list[int]:
        """SNAPSHOT versions = dirs carrying a manifest. A pruned
        version's data dirs can outlive its manifest while newer
        manifests still reference them — those dirs are storage, not
        readable snapshots, and listing them as versions once made a
        later prune() read a deleted manifest (crash) and retain
        half-pruned versions."""
        return [
            v for v in super().versions()
            if os.path.isfile(self._manifest_path(v))
        ]

    def prune(self, keep_last: int = 2) -> list[int]:
        """Retention GC at bucket-dir granularity: keep every bucket
        dir some RETAINED version's manifest references (versions
        share dirs across epochs), plus everything belonging to
        orphans above _CURRENT (a mid-crash replay target). A pruned
        version loses its manifest immediately (reported in the
        return, like the base store) and its data dirs as soon as the
        last referencing manifest is itself pruned — possibly on a
        LATER call, which is why GC candidates come from the disk
        listing, not from versions()."""
        import shutil

        cur = self.current_version()
        if cur is None:
            return []
        # over a plain-layout path (no manifest on the CURRENT version —
        # exactly the state left by flipping state_buckets on an
        # existing deployment) the retained set would compute EMPTY and
        # the sweep below would delete every version dir including the
        # _CURRENT snapshot; _manifest raises the migration error
        self._manifest(cur)
        keep_last = max(1, keep_last)
        committed = [v for v in self.versions() if v <= cur]
        retained = set(committed[-keep_last:])
        referenced: set[tuple[int, int]] = set()
        for v in retained:
            for b, o in self._manifest(v)["buckets"].items():
                referenced.add((o, b))
        doomed = []
        for v in (x for x in super().versions() if x <= cur):
            if v in retained:
                continue
            vdir = os.path.join(self.path, f"v{v}")
            for b in self._owned_buckets(v):
                if (v, b) not in referenced:
                    shutil.rmtree(self._bucket_dir(v, b), ignore_errors=True)
            if v in committed:
                try:
                    os.remove(self._manifest_path(v))
                except FileNotFoundError:
                    pass
                doomed.append(v)
            if not self._owned_buckets(v):
                shutil.rmtree(vdir, ignore_errors=True)
        self._manifest_cache.clear()
        return doomed


def read_canal_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based Canal-JSON stream (S1's file flavor; a kafka source
    swaps in by replacing this reader — the envelope parse is shared)."""
    reader = spark.readStream.schema(DML_ENVELOPE)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def typed_changes(
    dml: DataFrame, cfg: MappingConfig, value_schema: T.StructType
) -> DataFrame:
    """route -> explode -> project the stringly-typed Canal maps into
    typed image columns (+ old_<pk> for PK-changes)."""
    rows = explode_dml(route(dml, cfg))
    m = cfg.db_mapping
    # try_element_at, never element_at: the engine invariant
    # (session.py NOTE) — on an ANSI Spark 3.x session a plain
    # element_at THROWS on a missing map key (the 'old' map normally
    # carries only changed columns), which would wedge the stream in
    # an epoch-replay loop (r10 review; Spark 4 returns NULL either
    # way, so behavior here is unchanged)
    cols = [F.col("seq"), F.col("op")]
    for f in value_schema.fields:
        cols.append(
            F.try_element_at(F.col("data"), F.lit(f.name))
            .try_cast(f.dataType.simpleString()).alias(f.name)
        )
    for tgt, src in m.target_pk.items():
        pk_src = src or tgt
        dt = value_schema[pk_src].dataType.simpleString()
        cols.append(
            F.try_element_at(F.col("old"), F.lit(pk_src))
            .try_cast(dt).alias(f"old_{pk_src}")
        )
    return rows.select(*cols)


def apply_cdc_epoch(
    store: ParquetStateStore,
    batch_df: DataFrame,
    epoch_id: int,
    pk: list[str],
    on_schema_change=None,
) -> bool:
    """One foreachBatch epoch body: merge the typed change batch into
    the versioned state store. Returns True iff a new version was
    committed.

    Replay-safe (C10, the reference's transactional batch + rollback,
    BatchExecutor.java:60-91, re-expressed as epoch idempotence): if
    the store's epoch watermark already covers this epoch, the merge
    committed before the crash and the replay is a no-op — see
    ParquetStateStore's commit-marker contract. The check is on
    last_epoch(), NOT current_version(): a non-CDC commit in between
    (erase_keys) bumps the version without advancing the watermark,
    so it can never cause a future epoch to be silently skipped.

    ``on_schema_change`` (S9 injection point): zero-arg callable fired
    after commit when this epoch created the state table or changed
    its column set — the engine's version of the reference's notify
    after syncSchema DDL (PhoenixEtlService.java:162,174-215).

    Empty batches commit nothing and return False — the check lives
    in the store's merge-commit strategy (see _merge_commit_unlocked)."""
    # The whole read-merge-commit body runs under the store's commit
    # lock: the merge's basis (the state version read here) is then
    # still current at pointer-swap time, so an interleaved non-CDC
    # commit (erase_keys) can neither be silently undone by this
    # epoch nor silently undo it. foreachBatch epochs are already
    # serial with each other; the lock serializes them with admin
    # commits.
    with store.commit_lock():
        last = store.last_epoch()
        if last is not None and last >= epoch_id:
            return False
        cur = store.current_version()
        # Version tracks the epoch id while the two are aligned (the
        # normal stream), but can never step backwards onto — or into —
        # a snapshot an interleaved non-CDC commit (erasure) already
        # occupies.
        version = epoch_id if cur is None else max(cur + 1, epoch_id)
        # Schema heal (C11) happens INSIDE merge_cdc (reached via the
        # store's merge-commit strategy): its skip_missing=False path
        # aligns the prior state to the batch's image schema
        # (operators/merge.py) — no pre-align here, which would
        # re-implement merge's image-column filter and drift from it
        # (it once did, and missed is_ddl). The store picks the READ
        # and WRITE strategy: full-snapshot rewrite by default,
        # O(touched buckets) for PrunedParquetStateStore.
        new_state, prev_cols = store._merge_commit_unlocked(
            batch_df, pk, version, epoch_id
        )
    if new_state is None:  # empty batch — no version committed
        return False
    if on_schema_change is not None:
        new_cols = {c.lower() for c in new_state.columns}
        if prev_cols is None or prev_cols != new_cols:
            on_schema_change()
    return True


def _start_foreach(changes: DataFrame, apply_epoch, checkpoint_path: str,
                   available_now: bool):
    """Shared foreachBatch launch: update-mode writer with the epoch
    body + checkpoint, availableNow-triggered for drain-the-backlog
    runs."""
    writer = (changes.writeStream.foreachBatch(apply_epoch)
              .option("checkpointLocation", checkpoint_path)
              .outputMode("update"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_cdc_stream(
    spark: SparkSession,
    source_path: str,
    state_path: str,
    checkpoint_path: str,
    cfg: MappingConfig,
    value_schema: T.StructType,
    available_now: bool = True,
    notify_hook=None,
    retain_versions: int | None = None,
    max_files_per_trigger: int | None = None,
    state_buckets: int | None = None,
    prune_every: int = 1,
    state_broadcast_threshold_rows: int = 2_000_000,
):
    """Wire the full pipeline: file stream -> typed changes ->
    foreachBatch(merge into versioned parquet state). Returns the
    query handle; with available_now it drains pending files and stops
    (the test/batch-replay mode).

    ``max_files_per_trigger``: bound each micro-batch to N source
    files (epoch-granularity control — availableNow otherwise drains
    everything pending into ONE epoch; bench.py uses 1 to measure
    per-epoch overhead over a fixed epoch count).

    ``notify_hook``: callable(payload dict) fired on schema-changing
    epochs with the reference's ``{database, table}`` body; defaults
    to the HTTP notifier when ``cfg.notify_url`` is set (S9,
    PhoenixEtlService.java:174-215), else no-op.

    ``retain_versions``: when set, prune committed snapshots older
    than the newest N (the long-running deployment needs this or
    state size x epochs accumulates). ``prune_every`` sets the GC
    cadence: prune after every Nth committing epoch (default every
    epoch; a deployment with large n_buckets moves GC — an
    O(metadata) scan — off the per-epoch path by raising it).

    ``state_buckets``: when set, back the stream with the
    PrunedParquetStateStore (N PK-hash buckets) so each epoch's commit
    rewrites only the buckets its batch touches — O(batch) per-epoch
    I/O instead of O(state), the setting a long-lived large-state
    deployment wants. Default keeps the plain full-snapshot store."""
    from canal_phoenix_adapter_spark.notify import make_notifier, notify_payload

    pk = cfg.db_mapping.pk_source_columns()
    if state_buckets:
        # state_broadcast_threshold_rows: batches above it merge
        # broadcast-free (SCALE.md "Store selection rule")
        store: ParquetStateStore = PrunedParquetStateStore(
            spark, state_path, pk, n_buckets=state_buckets,
            broadcast_threshold_rows=state_broadcast_threshold_rows,
        )
    else:
        store = ParquetStateStore(spark, state_path)
    hook = notify_hook if notify_hook is not None else make_notifier(cfg)
    on_change = (lambda: hook(notify_payload(cfg))) if hook is not None else None

    # Prune cadence counts COMMITTING epochs, not epoch ids: empty
    # epochs never prune, so "epoch_id % N == 0" starves GC whenever
    # committing epochs systematically miss the multiples (r10 review)
    # — snapshots then accumulate unboundedly, the exact failure
    # retain_versions exists to prevent. Per-run counter: a restart
    # resets it, which at worst prunes one epoch early.
    n_committed = 0

    def apply_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        nonlocal n_committed
        committed = apply_cdc_epoch(
            store, batch_df, epoch_id, pk, on_schema_change=on_change
        )
        if committed and retain_versions is not None:
            n_committed += 1
            if n_committed % max(1, prune_every) == 0:
                store.prune(keep_last=retain_versions)

    stream = read_canal_stream(spark, source_path, max_files_per_trigger)
    changes = typed_changes(stream, cfg, value_schema)
    return _start_foreach(changes, apply_epoch, checkpoint_path, available_now)


def windowed_rollup_stream(
    events: DataFrame,
    bucket: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time tumbling-window rollup with late-data handling: the
    streaming twin of analytics.time_window_rollup (same grouping, same
    aggregates). The watermark bounds state: windows older than
    max(event_time) - watermark finalize and evict; events later than
    that are dropped — the knob the reference lacks entirely (its
    ordering is transaction-log position, SURVEY §2e note).

    Input must carry an event-time `ts` timestamp column; works on a
    readStream DataFrame (append mode output) and on a batch DataFrame
    (watermark is a no-op there, same results as the batch rollup).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", bucket).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            # try_cast per the engine invariant (session.py): under ANSI a
            # plain cast of one out-of-range value would wedge the stream
            # (the failed epoch replays forever)
            F.sum(F.col("value").try_cast("decimal(18,4)")).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("win.start")).alias("win_start_us"),
            "event_type", "n_events", "approx_users", "sum_value",
        )
    )


def stateful_running_totals(
    events: DataFrame,
    timeout_ms: int | None = 1_800_000,
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running event count + value sum, emitted per micro-batch,
    state evicted on processing-time timeout (timeout_ms). This is the extension
    point for operators Spark's built-ins can't express (the
    reference has no analogue; SURVEY §7.4 scale path for per-entity
    accumulators over unbounded streams).

    State is one (count, sum) pair per user — O(active keys), bounded
    by the timeout eviction. ``timeout_ms=None`` disables eviction
    (NoTimeout) — REQUIRED for Trigger.AvailableNow drain runs: with a
    processing-time timeout pending, the availableNow query keeps
    scheduling timeout-evaluation micro-batches and NEVER terminates
    (observed: 50+ empty batches on a one-file source; the old test
    masked it by ignoring awaitTermination's False).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            s += float(pdf["value"].sum())
        state.update((n, s))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                         if timeout_ms is not None
                         else GroupStateTimeout.NoTimeout),
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop events whose key was already seen,
    with state bounded by the watermark (dropDuplicatesWithinWatermark
    evicts keys older than max(event_time) - watermark; a duplicate
    arriving inside the horizon is dropped, one arriving later is the
    stream's responsibility to avoid — the standard at-least-once ->
    effectively-once trick for CDC/event feeds at 100 TB/day, where
    unbounded dedup state is impossible).

    The batch twin is exact_dedup / dropDuplicates; same key columns,
    same result on a replayed bounded input.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def run_cdc_stream_to_sink(
    spark: SparkSession,
    source_path: str,
    checkpoint_path: str,
    cfg: MappingConfig,
    value_schema: T.StructType,
    connection_factory,
    target_columns: set[str] | None = None,
    available_now: bool = True,
    commit_batch: int | None = None,
    heal=None,
):
    """The reference's actual topology: Canal stream -> typed changes
    -> executor-side Phoenix apply per epoch (no intermediate state
    table). Each foreachBatch epoch routes the batch through
    sinks.phoenix.write_changes — PK-hash partitioned, per-key
    seq-ordered, one transaction per partition with heal-replay —
    exactly the PhoenixSyncService sync loop driven by Structured
    Streaming instead of a message-queue consumer thread.

    Exactly-once caveat (same as the reference's): the epoch may
    replay after a crash, so the write path must be idempotent — it
    is, because UPSERT/DELETE on the PK are natural upserts
    (PhoenixSyncService relies on the identical property). The
    streaming checkpoint provides at-least-once epoch delivery;
    idempotent apply upgrades it to effectively-once."""
    from canal_phoenix_adapter_spark.sinks.phoenix import write_changes

    def apply_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_changes(
            batch_df, cfg, connection_factory,
            target_columns=target_columns,
            commit_batch=commit_batch, heal=heal,
        )

    stream = read_canal_stream(spark, source_path)
    changes = typed_changes(stream, cfg, value_schema)
    return _start_foreach(changes, apply_epoch, checkpoint_path, available_now)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each left event paired with the
    same-key right events whose event time falls within
    [left_ts - lookback, left_ts] — the streaming counterpart of the
    batch as-of join (operators/asof.py). True asof (exactly the
    latest match) is not expressible in Structured Streaming's
    append-mode join; the bounded-interval join IS, and the range
    condition is what lets Spark evict state.

    Scale notes: both sides carry a watermark, and the range
    condition gives the state store a per-key eviction bound — right
    rows older than (watermark + lookback) below the left watermark
    are dropped from state, so state size is O(events within the
    lookback window), not O(stream length). Without the range
    condition Spark would keep the entire right stream in state.

    ``left_ts``/``right_ts`` must be distinct column names (rename
    before calling when joining a stream to itself) — the condition
    references them unqualified so the joined output carries both.
    """
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must differ (rename one side) so the "
            "joined output is unambiguous"
        )
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    right_on = f"__r_{on}"
    r = r.withColumnRenamed(on, right_on)
    cond = (
        (F.col(on) == F.col(right_on))
        & (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
    )
    return l.join(r, cond, "inner").drop(right_on)


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    group_id_prefix: str | None = None,
) -> dict[str, str]:
    """Kafka reader options for the Canal-JSON topic (the reference's
    MQ flavor of S1 — canal delivers the same envelope over Kafka).
    Kept as a pure dict builder so it is unit-testable without a
    broker; ``read_canal_kafka`` applies it."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        # fail-fast on data loss: a CDC stream silently skipping
        # offsets corrupts downstream state irrecoverably
        "failOnDataLoss": "true",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if group_id_prefix is not None:
        opts["groupIdPrefix"] = group_id_prefix
    return opts


def read_canal_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    **kwargs,
) -> DataFrame:
    """Canal-JSON stream from Kafka: the envelope parse is shared with
    the file source (parse_dml_json on the message value), so the
    whole downstream pipeline — typed_changes -> apply_cdc_epoch — is
    source-agnostic. Requires the spark-sql-kafka package on the
    cluster: ``reader.load()`` resolves the data source EAGERLY, so
    calling this without the package raises (importing this module is
    safe; building the plan is not — which is why only
    kafka_source_options is unit-tested in this container)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap_servers, topic, **kwargs).items():
        reader = reader.option(k, v)
    return parse_dml_json(reader.load(), json_col="value")


def state_changes(
    store: ParquetStateStore,
    from_version: int,
    to_version: int,
    pk: list[str],
) -> DataFrame:
    """Change data feed between two committed state snapshots: the
    row-level (op, before, after) diff a downstream consumer replays
    to follow this store without reprocessing the source stream —
    the engine's own output expressed as CDC.

    Output: pk columns + ``op`` in {INSERT, UPDATE, DELETE} + every
    non-pk column twice (``<col>__before``, ``<col>__after``).
    Unchanged rows are excluded (full-row comparison, null-safe).
    Schema-straddling diffs (a DDL/heal epoch between the versions
    added or dropped columns) work: the value-column set is the UNION
    of both snapshots' columns, null-padded on the side that lacks a
    column — an added column surfaces as before=NULL, a dropped one
    as after=NULL.

    One full-outer shuffle join on the pk; snapshots written
    pk-partitioned (sorted/bucketed layout) let AQE elide the
    exchange."""
    old = store.read_version(from_version)
    new = store.read_version(to_version)
    # Column identity is CASE-INSENSITIVE (the engine's reference
    # identifier semantics, COVERAGE.md §2c note): merge_cdc heals
    # common columns toward the batch's casing, so a heal epoch can
    # re-case a state column between two snapshots — a case-sensitive
    # union then emitted BOTH casings and the diff died with
    # AMBIGUOUS_REFERENCE (r10 review, reproduced). Canonical spelling
    # = the NEW snapshot's.
    old_types = {f.name.lower(): f.dataType for f in old.schema.fields}
    new_types = {f.name.lower(): f.dataType for f in new.schema.fields}
    types = dict(old_types)
    types.update(new_types)
    pk_l = {p.lower() for p in pk}
    val_cols = [c for c in new.columns if c.lower() not in pk_l] + [
        c for c in old.columns
        if c.lower() not in new_types and c.lower() not in pk_l
    ]

    def side(df: DataFrame, tag: str, flag: str) -> DataFrame:
        have = {c2.lower(): c2 for c2 in df.columns}
        cols = []
        for c in val_cols:
            src = (F.col(have[c.lower()]) if c.lower() in have
                   else F.lit(None).cast(types[c.lower()]))
            cols.append(src.alias(f"{c}__{tag}"))
        return df.select(*pk, *cols, F.lit(1).alias(flag))

    o = side(old, "before", "__in_old")
    n = side(new, "after", "__in_new")
    j = o.join(n, on=pk, how="full_outer")
    changed = F.lit(False)
    for c in val_cols:
        b, a = F.col(f"{c}__before"), F.col(f"{c}__after")
        cl = c.lower()
        if (
            cl in old_types
            and cl in new_types
            and old_types[cl] != new_types[cl]
        ):
            # A heal/DDL epoch changed the column's TYPE between the
            # snapshots: a raw null-safe compare would either raise or
            # implicitly coerce. Forward leg: the row is CHANGED when
            # try_cast(old -> new) differs from the after-value (or
            # the new type cannot represent the old value) — a pure
            # widening (int 2 -> double 2.0, string "2" -> int 2) is
            # representation-only and emits no row, never an UPDATE
            # storm over the whole table. Reverse leg, NON-STRING old
            # types only: a lossy narrowing (double 2.5 healed to
            # int 2) passes the forward leg, but casting the after-
            # value back to the old type (2 -> 2.0 != 2.5) exposes
            # it — that compare is value-based and exact for numeric/
            # temporal old types. For a STRING old type the reverse
            # leg is skipped: casting numerics back to string compares
            # RENDERINGS, and '2' vs '2.0' would flag every non-
            # canonically-spelled row — a full-table UPDATE storm over
            # a semantically lossless heal. Output keeps each side's
            # own type.
            bc = b.try_cast(new_types[cl])
            changed = (
                changed
                | ~bc.eqNullSafe(a)
                | (b.isNotNull() & bc.isNull())
            )
            if not isinstance(old_types[cl], T.StringType):
                ac = a.try_cast(old_types[cl])
                changed = (
                    changed
                    | ~ac.eqNullSafe(b)
                    | (a.isNotNull() & ac.isNull())
                )
        else:
            changed = changed | ~b.eqNullSafe(a)
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("INSERT"))
        .when(F.col("__in_new").isNull(), F.lit("DELETE"))
        .when(changed, F.lit("UPDATE"))
    )
    return (
        j.withColumn("op", op)
        .where(F.col("op").isNotNull())
        .select(*pk, "op",
                *[F.col(f"{c}__before") for c in val_cols],
                *[F.col(f"{c}__after") for c in val_cols])
    )


class EraseResult(NamedTuple):
    """erase_keys receipt: the committed snapshot version plus the
    audited number of state rows the erasure actually removed."""
    version: int
    erased: int


def erase_keys(
    store: ParquetStateStore,
    keys: DataFrame,
    pk: list[str],
) -> EraseResult:
    """Compliance deletion (GDPR/CCPA erasure): remove every state row
    whose PK appears in ``keys`` and commit the result as a NEW
    snapshot version — auditable (the pre-erasure snapshot remains
    until `prune`), atomic (the _CURRENT repoint), and idempotent
    (re-running with the same keys is a no-op rewrite).

    Plan: one LEFT ANTI join of the state table against the key set —
    at 100 TB the key set is tiny relative to state, so AQE broadcasts
    it and the state table is filtered in place, never shuffled.
    Returns EraseResult(version, erased): the committed version id and
    the AUDITED number of state rows the erasure actually removed — a
    compliance deletion whose report says "done" while a dtype or key
    mismatch silently erased nothing is the worst failure mode here,
    so the count comes from a LEFT SEMI join of the same basis against
    the same cast keyset (on the pruned store that agg is bounded to
    the touched buckets, like the erasure itself; erase-of-absent-key
    commits a version and reports erased=0).

    Safe concurrent with the CDC stream, on two mechanisms. (1) The
    whole basis-read -> anti-join -> commit runs under the store's
    commit lock, serialized with apply_cdc_epoch's equally-locked
    body — without it the two are a check-then-act race where the
    second pointer swap publishes a snapshot computed without the
    first commit's changes (losing either a committed epoch or the
    erasure itself, silently). (2) The erasure commit bumps only the
    snapshot VERSION and carries the epoch watermark forward (write
    with epoch_id=None), so apply_cdc_epoch's replay check — which
    reads last_epoch(), not current_version() — still applies every
    future epoch; and because CDC writes target max(cur+1, epoch_id),
    a later epoch can never overwrite the erasure snapshot's
    directory either.

    On a PrunedParquetStateStore the erasure itself is bucket-pruned:
    only buckets holding an erased key are anti-joined and rewritten,
    the rest carry over through the manifest — a full-state rewrite
    for a handful of subjects' keys is exactly the O(state) cost that
    store exists to avoid.

    NOTE: erasure of rows the CDC stream may re-deliver needs the
    upstream retention/tombstone handled too — this erases the
    engine's materialized state, which is the part this engine owns."""
    with store.commit_lock():
        cur = store.current_version()
        if cur is None:
            raise ValueError("no committed state to erase from")
        new_version = cur + 1
        keyset = keys.select(*pk).dropDuplicates(pk)
        if isinstance(store, PrunedParquetStateStore):
            if [k.lower() for k in pk] != [k.lower() for k in store.pk]:
                raise ValueError(
                    f"erasure pk {pk} != store bucketing pk {store.pk}: "
                    "a mismatched key would bucket-hash wrong and the "
                    "erasure would silently miss its rows"
                )
            manifest = store._manifest(cur)
            store._check_modulus(manifest)
            # hash() is TYPE-sensitive: a caller keyset whose pk dtype
            # differs from the state's (int keys vs long state) would
            # compute buckets the state never uses and the erasure
            # would no-op while reporting success — cast to the
            # manifest schema's pk types BEFORE bucketing (try_cast:
            # a key the state type cannot represent matches no state
            # row by construction, so a NULL key is a correct miss)
            pk_types = {
                f.name.lower(): f.dataType
                for f in store._schema_of(manifest).fields
            }
            # na.drop: a null-cast key matches no state row, but
            # hash(NULL) is constant — kept, it would mark (and
            # rewrite) one spurious touched bucket
            keyset = keyset.select(
                *[F.col(k).try_cast(pk_types[k.lower()]).alias(k) for k in pk]
            ).na.drop()
            touched = {
                r["b"] for r in keyset.select(
                    store._bucket_of([F.col(k) for k in pk]).alias("b")
                ).distinct().collect()
            }
            basis = store._read_buckets(manifest, touched)
            # audited post-condition, bounded to the touched buckets
            erased = basis.join(
                F.broadcast(keyset), on=pk, how="left_semi"
            ).count()
            new_t = basis.join(F.broadcast(keyset), on=pk, how="left_anti")
            store._commit_touched(new_t, new_version, manifest, touched,
                                  store._schema_of(manifest),
                                  store.last_epoch())
        else:
            state = store.read()
            erased = state.join(keyset, on=pk, how="left_semi").count()
            new_state = state.join(keyset, on=pk, how="left_anti")
            store._write_unlocked(new_state, new_version, epoch_id=None)
    return EraseResult(new_version, erased)
