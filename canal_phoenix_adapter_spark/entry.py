"""Driver-facing query registry: every implemented operator from
SURVEY.md §2 exposed as (spark, sf_dir) -> DataFrame, with matching
DuckDB oracle SQL (the driver's t2 correctness gate).

Conventions (driver contract, /root/repo/__spark_entry__.py):
  * every computed column is aliased identically in Spark and SQL;
  * results are deterministic sets (order-insensitive hash compare);
  * floating-point outputs are avoided where engines could disagree
    bit-wise (ranks are returned instead of raw cosine scores).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_phoenix_adapter_spark.config import DbMapping
from canal_phoenix_adapter_spark.operators import etl as etl_ops
from canal_phoenix_adapter_spark.operators.merge import keep_last, merge_cdc
from canal_phoenix_adapter_spark.sources import events as ev
from canal_phoenix_adapter_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


# ---------------------------------------------------------------------------
# CDC merge family (C1-C9): synthetic change stream over events.parquet
# ---------------------------------------------------------------------------

_MERGE_ORACLE_TEMPLATE = """
WITH changes AS ({changes}),
timeline AS (
    SELECT user_id AS k, seq, 1 AS is_create, user_id, value, ts_us
    FROM changes WHERE op IN ('INSERT','UPDATE')
    UNION ALL
    SELECT user_id AS k, seq, 0 AS is_create, NULL::BIGINT, NULL::DOUBLE, NULL::BIGINT
    FROM changes WHERE op = 'DELETE'
    UNION ALL
    SELECT old_user_id AS k, seq, 0 AS is_create, NULL::BIGINT, NULL::DOUBLE, NULL::BIGINT
    FROM changes WHERE op IN ('INSERT','UPDATE')
      AND old_user_id IS NOT NULL AND old_user_id <> user_id
),
last AS (
    SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC, is_create DESC) AS rn
    FROM timeline
)
SELECT user_id, value, ts_us FROM last WHERE rn = 1 AND is_create = 1
"""


@register(
    "cdc_merge_full",
    _MERGE_ORACLE_TEMPLATE.format(changes=ev.SYNTHETIC_CHANGES_SQL),
)
def cdc_merge_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full CDC apply (C1-C6, C8) — inserts, keep-last
    updates, deletes, PK-changes — folded to the final state table."""
    changes = ev.synthetic_changes(load_table(spark, sf_dir, "events"))
    return merge_cdc(None, changes, ["user_id"], old_prefix="old_")


@register(
    "cdc_merge_upsert_delete",
    _MERGE_ORACLE_TEMPLATE.format(changes=ev.SYNTHETIC_CHANGES_NO_PKCHANGE_SQL),
)
def cdc_merge_upsert_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3/C4/C6 without PK-changes: upsert + delete + last-writer-wins."""
    changes = ev.synthetic_changes(load_table(spark, sf_dir, "events"), with_pk_change=False)
    return merge_cdc(None, changes, ["user_id"], old_prefix="old_")


@register(
    "cdc_keep_last",
    """
    SELECT event_id, user_id, event_type, value FROM (
        SELECT event_id, user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def cdc_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 as a standalone operator: per-key keep-last by sequence."""
    df = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    return keep_last(df, ["user_id"], "event_id")


@register(
    "cdc_merge_into_state",
    """
    WITH state AS (
        SELECT user_id, CAST(-1 AS DOUBLE) AS value, CAST(0 AS BIGINT) AS ts_us
        FROM (SELECT DISTINCT user_id FROM events)
    ),
    changes AS (
        SELECT event_id AS seq,
               CASE event_type WHEN 'signup' THEN 'INSERT'
                               WHEN 'error'  THEN 'DELETE'
                               ELSE 'UPDATE' END AS op,
               user_id, CAST(NULL AS BIGINT) AS old_user_id, value, epoch_us(ts) AS ts_us
        FROM events WHERE event_id % 3 = 0
    ),
    timeline AS (
        SELECT user_id AS k, seq, 1 AS is_create, user_id, value, ts_us
        FROM changes WHERE op IN ('INSERT','UPDATE')
        UNION ALL
        SELECT user_id AS k, seq, 0, NULL::BIGINT, NULL::DOUBLE, NULL::BIGINT
        FROM changes WHERE op = 'DELETE'
    ),
    last AS (
        SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC, is_create DESC) AS rn
        FROM timeline
    ),
    survivors AS (SELECT user_id, value, ts_us FROM last WHERE rn = 1 AND is_create = 1),
    touched AS (SELECT DISTINCT k AS user_id FROM timeline)
    SELECT s.user_id, s.value, s.ts_us FROM state s ANTI JOIN touched t USING (user_id)
    UNION ALL
    SELECT * FROM survivors
    """,
)
def cdc_merge_into_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3-C6 + C10: merge a change batch into an existing keyed state
    (the anti-join/union kernel that foreachBatch drives per epoch)."""
    events = load_table(spark, sf_dir, "events")
    state = events.select("user_id").distinct().select(
        "user_id",
        F.lit(-1.0).alias("value"),
        F.lit(0).cast("long").alias("ts_us"),
    )
    changes = ev.synthetic_changes(
        events.where(F.col("event_id") % 3 == 0), with_pk_change=False
    )
    return merge_cdc(state, changes, ["user_id"], old_prefix="old_")


# ---------------------------------------------------------------------------
# ETL family (S2, F2, F3, A1, A2, X3)
# ---------------------------------------------------------------------------


@register(
    "etl_scan_condition",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_totalprice >= 200000 AND o_orderstatus = 'F'
    """,
)
def etl_scan_condition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+F3: conditional extract with a templated etlCondition."""
    cfg = DbMapping(
        database="tpch", table="orders", target_table="t.orders",
        etl_condition="where o_totalprice >= {0} and o_orderstatus = '{1}'",
        escape_upper=False,
    )
    df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    return etl_ops.append_condition(df, cfg, [200000, "F"])


@register(
    "etl_incremental_sys_time",
    """
    SELECT event_id, user_id, epoch_us(ts) AS sys_time
    FROM events WHERE epoch_us(ts) >= epoch_us(TIMESTAMP '2024-01-20 00:00:00')
""",
)
def etl_incremental_sys_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: single-param incremental extract on the SYS_TIME column."""
    cfg = DbMapping(database="d", table="t", target_table="t.t", escape_upper=False)
    df = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts_us").alias("sys_time")
    )
    return etl_ops.append_condition(df, cfg, [1705708800000000])


@register("etl_count", "SELECT count(1) AS cnt FROM lineitem")
def etl_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: COUNT(1) of the target table."""
    return etl_ops.count_table(load_table(spark, sf_dir, "lineitem"))


@register(
    "etl_count_filtered",
    "SELECT count(1) AS cnt FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01'",
)
def etl_count_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: COUNT(1) over the conditioned extract."""
    cfg = DbMapping(
        database="d", table="t", target_table="t.t",
        etl_condition="where l_shipdate >= '2000-01-01'",
    )
    return etl_ops.count_filtered(load_table(spark, sf_dir, "lineitem"), cfg)


@register(
    "etl_idempotent_load",
    """
    SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def etl_idempotent_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: delete-before-insert idempotent backfill == latest row per
    PK (deterministic dropDuplicates via keep_last)."""
    df = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return keep_last(df, ["user_id"], "event_id").select("user_id", "event_id", "value")


# ---------------------------------------------------------------------------
# Projection / scalar family (P1-P7) over customer + events
# ---------------------------------------------------------------------------


@register(
    "proj_mapping_exclude_rename",
    """
    SELECT c_custkey AS CUSTKEY, c_name AS NAME, c_mktsegment AS SEGMENT
    FROM customer
    """,
)
def proj_mapping_exclude_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+P3+P6: mapAll with renames, exclusion, escapeUpper."""
    from canal_phoenix_adapter_spark.operators.transform import apply_mapping

    cfg = DbMapping(
        database="tpch", table="customer", target_table="t.customer",
        map_all=True,
        target_columns={"custkey": "c_custkey", "name": "c_name", "segment": "c_mktsegment"},
        exclude_columns=["c_acctbal", "c_nationkey"],
        escape_upper=True,
    )
    df = load_table(spark, sf_dir, "customer")
    out = apply_mapping(df, cfg)
    return out.select("CUSTKEY", "NAME", "SEGMENT")


@register(
    "proj_enum_decode",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber BETWEEN 1 AND 3
                THEN (['first','second','third'])[l_linenumber]
                ELSE CAST(l_linenumber AS VARCHAR) END AS line_label
    FROM lineitem
    """,
)
def proj_enum_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: 1-based enum decode with out-of-range passthrough."""
    from canal_phoenix_adapter_spark.functions.enums import enum_decode

    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    return df.withColumn(
        "line_label", enum_decode(F.col("l_linenumber"), ["first", "second", "third"])
    )


@register(
    "proj_type_coercion",
    """
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           CASE WHEN json_extract_string(props, '$.k') IS NULL THEN NULL
                WHEN json_extract_string(props, '$.k') = '0' THEN FALSE
                ELSE TRUE END AS k_bool,
           CAST(TRY_CAST(value AS DECIMAL(12,2)) AS VARCHAR) AS value_dec,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS day
    FROM events
    """,
)
def proj_type_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: the coercion matrix over stringly-typed JSON values —
    int/bool/decimal/date paths, NULL on unparseable."""
    from canal_phoenix_adapter_spark.functions.coerce import boolean_lenient, coerce_to
    from pyspark.sql import types as T

    df = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return df.select(
        "event_id",
        coerce_to(k, T.IntegerType()).alias("k_int"),
        boolean_lenient(k).alias("k_bool"),
        coerce_to(F.col("value"), T.DecimalType(12, 2)).cast("string").alias("value_dec"),
        F.col("ts").cast("date").cast("string").alias("day"),
    )


@register(
    "proj_zero_date",
    """
    SELECT doc_id,
           CASE WHEN raw LIKE '0000-00-00%' THEN raw
                ELSE CAST(TRY_CAST(raw AS DATE) AS VARCHAR) END AS birth
    FROM (
        SELECT doc_id,
               CASE doc_id % 4 WHEN 0 THEN '0000-00-00'
                               WHEN 1 THEN '2024-01-15'
                               WHEN 2 THEN 'garbage'
                               ELSE '0000-00-00 12:00:00' END AS raw
        FROM documents
    )
    """,
)
def proj_zero_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: zero-date passthrough, parseable canonicalized, garbage NULL."""
    from canal_phoenix_adapter_spark.functions.coerce import zero_date_lenient

    df = load_table(spark, sf_dir, "documents").select("doc_id")
    raw = (
        F.when(F.col("doc_id") % 4 == 0, "0000-00-00")
        .when(F.col("doc_id") % 4 == 1, "2024-01-15")
        .when(F.col("doc_id") % 4 == 2, "garbage")
        .otherwise("0000-00-00 12:00:00")
    )
    return df.select("doc_id", zero_date_lenient(raw, "date").alias("birth"))


def flagship(spark: SparkSession) -> DataFrame:
    """entry(spark): the minimum end-to-end slice (SURVEY §7.2) at
    sf0.001 — full CDC merge over the synthetic change stream."""
    return cdc_merge_full(spark, "/root/testdata/sf0.001")
