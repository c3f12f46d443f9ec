"""Parquet table loaders for the driver-generated testdata
(TESTDATA.md). At production scale these would be external-catalog
tables; here a thin path helper keeps call sites declarative so
predicate pushdown / column pruning reach the parquet scans."""

from __future__ import annotations

import logging
import os
import re

from pyspark.sql import DataFrame, SparkSession

logger = logging.getLogger(__name__)

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def fan_out(spark: SparkSession, df: DataFrame, n_bytes: int | None = None) -> DataFrame:
    """Guarantee full map-side parallelism on narrow inputs.

    The driver's testdata writes each table as ONE parquet row group,
    so the scan is a single split and everything up to the first
    shuffle (explode, hashing, casts, partial aggregation — the
    CPU-heavy map side) runs on one core while 31 idle. A round-robin
    repartition right after the scan costs one tiny shuffle (the raw
    table bytes) and buys full-width map parallelism.

    The trigger is the file size (driver-side stat, no job, no plan
    conversion): anything under one scan-split-per-core is "narrow".
    At production scale a 100 TB table is thousands of splits, the
    condition is false, and this is a no-op — no shuffle is ever added
    to a big input. The guard is fail-SAFE: a KNOWN-small size is the
    only thing that triggers the repartition. Unknown size (remote
    object-store path the driver cannot stat) must never shuffle —
    repartitioning a 100 TB table because a stat failed would be the
    exact disaster this helper exists to avoid. Filters still push
    down to the scan: Catalyst moves predicates through
    RepartitionOperation nodes.
    """
    if n_bytes is None:
        return df
    target = spark.sparkContext.defaultParallelism
    max_split = _byte_string_as_bytes(
        str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    )
    if n_bytes >= target * max_split:
        return df
    return df.repartition(target)


_SIZE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
    "p": 1 << 50, "pb": 1 << 50,
}


def _byte_string_as_bytes(s: str) -> int:
    """Spark size-conf grammar ("128m", "1gb", bare number = bytes) in
    pure Python: the py4j JavaUtils route cost a JVM round-trip per
    call and silently fell back to 128 MiB wherever the gateway is
    absent. (fan_out as a whole still needs a classic session — it
    reads sparkContext.defaultParallelism — so this is one removed
    Connect incompatibility, not Connect support.) 128 MiB fallback
    only for a genuinely unparseable string."""
    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]*)\s*", s)
    if m and m.group(2).lower() in _SIZE_SUFFIX:
        return int(m.group(1)) * _SIZE_SUFFIX[m.group(2).lower()]
    logger.warning(
        "unparseable size string %r (Spark would reject it); "
        "falling back to 128 MiB", s,
    )
    return 134217728


def dataset_size(path: str) -> int | None:
    """Total data bytes of a local parquet dataset, or None if
    unknowable (remote/unstat-able path — fan_out then never adds a
    shuffle). getsize on a DIRECTORY does not raise — it returns the
    ~4 KiB inode size, which would make every directory-style dataset
    (the normal production layout) look tiny and get repartitioned —
    so directories are detected explicitly and walked RECURSIVELY (a
    hive-partitioned layout nests part files under key=value
    subdirectories; summing only the top level would repeat the
    inode-size mistake one level down). Dot/underscore entries
    (_SUCCESS, _metadata, hidden files) are skipped."""
    if os.path.isdir(path):
        # same unknowable->None contract as the file branch: a dangling
        # symlink or a part file deleted mid-walk (writer cleanup) must
        # not crash plan time (r10 review)
        try:
            n_bytes = 0
            for root, dirs, files in os.walk(path):
                dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
                n_bytes += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if not f.startswith((".", "_"))
                )
            return n_bytes
        except OSError:
            return None
    try:
        return os.path.getsize(path)
    except OSError:  # remote path / missing: unknown size
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    events.parquet stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark 4 rejects by default (PARQUET_TYPE_ILLEGAL). We read it via
    the legacy nanos-as-long conf (runtime-settable) and expose:
      * ``ts_us``  bigint epoch microseconds (exact; DuckDB's
        ``epoch_us(ts)`` matches it bit-for-bit — DuckDB likewise
        truncates ns->us on read), and
      * ``ts``     a proper TimestampType truncated to micros (Spark's
        native precision) for window/watermark use.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    n_bytes = dataset_size(path)
    if name != "events":
        return fan_out(spark, spark.read.parquet(path), n_bytes)
    # Scope the legacy conf to THIS read and restore the caller's value:
    # leaving it set session-wide silently changed how every later
    # parquet read decodes TIMESTAMP(NANOS) — bigint nanos instead of
    # the expected loud PARQUET_TYPE_ILLEGAL (r10 review; the relation
    # captures the conf at read time, verified, so restoring is safe).
    prior = None
    try:
        prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - conf locked down
        pass
    try:
        df = spark.read.parquet(path)
    finally:
        try:
            if prior is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
        except Exception:  # pragma: no cover - conf locked down
            pass
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        from pyspark.sql import functions as F

        # integer div, not floor(x/1000.0): double division loses the
        # last digit at 1.7e18 nanos and the oracle compares exact ints
        ts_us = F.expr("ts div 1000")
        df = df.withColumn("ts_us", ts_us).withColumn(
            "ts", F.timestamp_micros(ts_us)
        )
    elif ts_type == "timestamp_ntz":
        from pyspark.sql import functions as F

        # zone-free epoch micros (unix_micros rejects NTZ); then rebuild
        # ts as the same micros-truncated TimestampType the nanos branch
        # yields so both testdata vintages produce one schema downstream
        ts_us = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
        df = df.withColumn("ts_us", ts_us).withColumn(
            "ts", F.timestamp_micros(F.col("ts_us"))
        )
    else:  # driver session already decodes nanos some other way
        from pyspark.sql import functions as F

        df = df.withColumn("ts_us", F.unix_micros(F.col("ts")))
    return fan_out(spark, df, n_bytes)

