"""Lake-layout parquet sink: the output-side half of the 100 TB
story. A pipeline that reads 100 TB but writes a million 2 MB files
(or 200 unsplittable 500 GB ones) has just moved its scale problem
downstream — every later scan pays for today's layout.

Three knobs, all standard Spark mechanics:
  * ``partition_by`` — hive-style directory partitioning on low-
    cardinality columns (date, lang, source): later queries touching
    one partition scan one directory (partition pruning).
  * ``target_files`` — repartition to a chosen output-file count
    BEFORE the write. By key columns (files become hash-bucketed and
    co-located per partition value); with ``partition_by`` but no
    keys, hashed on the partition columns — total files are then
    bounded by distinct(partition values), each value written by ONE
    task (round-robin here would put EVERY value in EVERY task and
    emit tasks x values small files, the exact disaster this module
    exists to prevent; r10 review). Honest limit of that default: a
    single HOT partition value is one task and one file — spreading
    it needs per-row information this sink won't buy with an extra
    full scan, so pair ``max_records_per_file`` (splits the writer's
    output) or pass ``repartition_keys`` including a row-unique
    column (r10 fix-review). Round-robin only when neither is set.
  * ``sort_within`` — sortWithinPartitions before the write: rows
    inside each file arrive ordered (e.g. by doc_id or event time),
    which makes parquet min/max row-group statistics selective —
    a later range predicate skips whole row groups. A *local* sort:
    no global ordering shuffle.

``max_records_per_file`` caps runaway files independently of the
repartition (Spark splits a writer task's output at the cap).

The reference's closest analogue is the commit batching knob
(support/BatchExecutor.java:60-91 commitBatch); a lakehouse sink's
equivalent throughput knob is file sizing, hence this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["write_lake"]


def write_lake(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    target_files: int | None = None,
    repartition_keys: list[str] | None = None,
    sort_within: list[str] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a query-friendly parquet lake table."""
    out = df
    if target_files is not None:
        if repartition_keys:
            out = out.repartition(target_files, *[F.col(c) for c in repartition_keys])
        elif partition_by:
            # see module docstring: round-robin + partitionBy multiplies
            # files by distinct(partition values)
            out = out.repartition(target_files, *[F.col(c) for c in partition_by])
        else:
            out = out.repartition(target_files)
    elif repartition_keys:
        # keys without a file count: hash-cluster by key at the default
        # shuffle parallelism (still co-locates each key's rows)
        out = out.repartition(*[F.col(c) for c in repartition_keys])
    if sort_within:
        # When also writing partitionBy dirs, LEAD the sort with the
        # partition columns: the file writer REQUIRES an ordering on
        # them, and if our sort doesn't satisfy it Spark inserts its
        # own SortExec on just the partition keys — silently voiding
        # the in-file ordering (and the parquet min/max row-group
        # selectivity it exists for). Prefixing satisfies the required
        # ordering, so our full sort survives to the files.
        # ALL partition columns lead, even ones the caller listed mid-
        # sort (sort_within=["x", "pdate"] with partition_by=["pdate"]
        # would otherwise still violate the required ordering and Spark
        # would re-insert its own SortExec). Within one output file the
        # partition columns are constant anyway, so hoisting them
        # changes nothing about the caller's intended in-file order.
        lead = list(partition_by or [])
        tail = [c for c in sort_within if c not in lead]
        out = out.sortWithinPartitions(*lead, *tail)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)
