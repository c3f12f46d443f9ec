"""Service-layer parity: result envelopes, notify payload, skipMissing
and limit threading (VERDICT r1 items 4/6/7)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from canal_phoenix_adapter_spark.config import DbMapping, MappingConfig
from canal_phoenix_adapter_spark.notify import make_notifier, notify_payload
from canal_phoenix_adapter_spark.operators.etl import (
    count_result,
    peel_debug,
    run_etl_import,
)
from canal_phoenix_adapter_spark.operators.merge import merge_cdc
from canal_phoenix_adapter_spark.operators.schema_sync import parse_ddl
from canal_phoenix_adapter_spark.operators.transform import apply_mapping
from canal_phoenix_adapter_spark.sources.jdbc import read_options


def test_peel_debug():
    assert peel_debug(["_debug", "2024-01-01"]) == (True, ["2024-01-01"])
    assert peel_debug(["2024-01-01"]) == (False, ["2024-01-01"])
    assert peel_debug(None) == (False, None)
    assert peel_debug([]) == (False, [])


def test_etl_result_envelope_success(spark):
    """EtlResult shape (PhoenixEtlService.java:220-307): succeeded +
    rowsProcessed + resultMessage, _debug peeled off params."""
    df = spark.createDataFrame([(1, "a"), (2, "b"), (2, "b")], "id long, v string")
    cfg = DbMapping(
        database="d", table="t", target_table="D.T", target_pk={"ID": "id"}
    )
    res = run_etl_import(df, cfg, params=["_debug"])
    assert res["succeeded"] is True and res["debug"] is True
    assert res["rowsProcessed"] == 2  # idempotent dedup on PK
    assert "D.T" in res["resultMessage"]
    assert res["errors"] == []


def test_etl_result_envelope_failure(spark):
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    cfg = DbMapping(
        database="d", table="t", target_table="D.T", target_pk={"ID": "id"},
        etl_condition="where no_such_column = {0}",
    )
    res = run_etl_import(df, cfg, params=["1"])
    assert res["succeeded"] is False and res["rowsProcessed"] == 0
    assert res["errors"] and "etl failed" in res["errors"][0]


def test_count_result_envelope(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    cfg = DbMapping(database="d", table="t", target_table="D.T")
    assert count_result(df, cfg) == {
        "succeeded": True, "count": 3, "targetTable": "D.T",
    }


def test_notify_payload_target_db_vs_split():
    with_db = MappingConfig(
        db_mapping=DbMapping(
            database="d", table="t", target_table="USER", target_db="MYTEST"
        )
    )
    assert notify_payload(with_db) == {"database": "MYTEST", "table": "USER"}
    split = MappingConfig(
        db_mapping=DbMapping(database="d", table="t", target_table="MYTEST.USER")
    )
    assert notify_payload(split) == {"database": "MYTEST", "table": "USER"}


def test_make_notifier_none_without_url():
    cfg = MappingConfig(db_mapping=DbMapping(database="d", table="t", target_table="X"))
    assert make_notifier(cfg) is None


def test_apply_mapping_skip_missing_drops_unknown_target(spark):
    df = spark.createDataFrame([(1, "a", "z")], "id long, name string, extra string")
    target = T.StructType(
        [T.StructField("ID", T.LongType()), T.StructField("NAME", T.StringType())]
    )
    base = dict(database="d", table="t", target_table="D.T", target_pk={"ID": "id"})
    skipped = apply_mapping(df, DbMapping(**base, skip_missing=True), target)
    assert skipped.columns == ["ID", "NAME"]
    # without the flag the unknown column passes through for the heal path
    kept = apply_mapping(df, DbMapping(**base, skip_missing=False), target)
    assert "EXTRA" in kept.columns


def test_merge_cdc_skip_missing_keeps_state_schema(spark):
    """skipMissing at merge granularity: a batch carrying a column the
    state lacks applies WITHOUT widening the state
    (PhoenixSyncService.java:399-411); default heals the state up."""
    state = spark.createDataFrame([(1, "a")], "id long, v string")
    batch = spark.createDataFrame(
        [(10, "UPDATE", 1, "a2", "new")], "seq long, op string, id long, v string, w string"
    )
    skipped = merge_cdc(state, batch, ["id"], skip_missing=True)
    assert skipped.columns == ["id", "v"]
    assert {tuple(r) for r in skipped.collect()} == {(1, "a2")}
    healed = merge_cdc(state, batch, ["id"], skip_missing=False)
    assert "w" in healed.columns


def test_parse_ddl_limit_threading():
    sql = "ALTER TABLE t ADD COLUMN price decimal(10,2)"
    limited = parse_ddl(sql, limit=True)[0]
    assert limited.dtype == T.DecimalType(10, 2)
    unlimited = parse_ddl(sql, limit=False)[0]
    assert unlimited.dtype == T.DecimalType(38, 18)


def test_read_options_requires_bounds_with_partition_column():
    cfg = DbMapping(database="d", table="t", target_table="D.T")
    with pytest.raises(ValueError, match="lower_bound"):
        read_options("jdbc:x", cfg, partition_column="id")
    with pytest.raises(ValueError, match="lower_bound"):
        read_options("jdbc:x", cfg, partition_column="id", lower_bound=0)
    opts = read_options(
        "jdbc:x", cfg, partition_column="id", lower_bound=0, upper_bound=10
    )
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "10"


def test_etl_import_pk_renamed_only_in_target_pk(spark):
    """targetPk={'ID': 'uid'} without a matching targetColumns entry:
    the mapped output carries the column under its (escaped) SOURCE
    name, and the idempotent dedup must resolve it there instead of
    failing on the nonexistent target name — a config shape the
    reference accepts."""
    from canal_phoenix_adapter_spark.operators.etl import etl_import

    df = spark.createDataFrame(
        [(1, "a"), (1, "a2"), (2, "b")], "uid long, name string"
    )
    cfg = DbMapping(
        database="d", table="t", target_table="D.T", target_pk={"ID": "uid"}
    )
    out = etl_import(df, cfg)
    assert sorted(out.columns) == ["NAME", "UID"]
    assert out.count() == 2  # deduped on the resolved UID column


def test_envelope_seq_clamps_future_es(spark):
    """An es past 2038 (garbage future binlog timestamp) must clamp to
    the 31-bit second budget instead of overflowing int64 in the shift
    multiply (ANSI mode turns that overflow into a batch-killing
    error)."""
    import json as _json

    from canal_phoenix_adapter_spark.sources.events import (
        explode_dml,
        parse_dml_json,
    )

    far_future_ms = (2**31 + 5) * 1000  # past the 31-bit second budget
    e = {
        "destination": "example", "database": "d", "table": "t",
        "type": "INSERT", "isDdl": False, "es": far_future_ms,
        "ts": far_future_ms, "data": [{"id": "1"}], "old": None,
    }
    raw = spark.createDataFrame([(_json.dumps(e),)], "value string")
    rows = explode_dml(parse_dml_json(raw)).collect()  # must not raise
    # second clamps to 2^31-1; the 6000 ms the clamp displaced lands
    # in the (bounded) delivery-lag tiebreak field
    assert rows[0]["seq"] == (2**31 - 1) * (1 << 32) + 6000 * (1 << 18)


def test_etl_import_dedup_is_deterministic(spark):
    """X3 idempotence: duplicate-PK rows must resolve to the SAME
    winner on every run — dropDuplicates(pk) keeps whichever row a
    task saw first (partitioning-dependent), so etl_import uses the
    max-by-payload-value rule instead (r8 review)."""
    from canal_phoenix_adapter_spark.operators.etl import etl_import

    cfg = DbMapping(
        database="d", table="t", target_table="D.T", target_pk={"id": "id"}
    )
    rows = [(1, "a"), (1, "z"), (1, "m"), (2, "q")]
    a = etl_import(
        spark.createDataFrame(rows, "id long, name string"), cfg
    ).collect()
    b = etl_import(
        spark.createDataFrame(list(reversed(rows)), "id long, name string")
        .repartition(7), cfg,
    ).collect()
    got_a = {r["ID"]: r["NAME"] for r in a}
    got_b = {r["ID"]: r["NAME"] for r in b}
    assert got_a == got_b == {1: "z", 2: "q"}  # max payload wins, always


def test_etl_import_map_payload_falls_back_to_drop_duplicates(spark):
    """A map-typed payload column has no total order, so the
    max(struct(payload)) rule would fail at analysis; etl_import must
    fall back to dropDuplicates(pk) for that config shape (r8 advice).
    One row per PK and the correct schema — the winner among true
    duplicates is partitioning-dependent by documented fallback."""
    from pyspark.sql import functions as F

    from canal_phoenix_adapter_spark.operators.etl import etl_import

    cfg = DbMapping(
        database="d", table="t", target_table="D.T", target_pk={"id": "id"}
    )
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "id long, k string"
    ).select("id", F.create_map(F.col("k"), F.lit(1)).alias("attrs"))
    out = etl_import(df, cfg)  # must not raise at analysis
    rows = out.collect()
    assert sorted(out.columns) == ["ATTRS", "ID"]
    assert sorted(r["ID"] for r in rows) == [1, 2]


def test_etl_import_variant_payload_falls_back_too(spark):
    """VariantType is unorderable like maps (Spark's
    checkForOrderingExpr rejects both); the fallback detection must
    cover it or a variant payload dies at analysis (r9 review)."""
    from pyspark.sql import functions as F

    from canal_phoenix_adapter_spark.operators.etl import etl_import

    cfg = DbMapping(
        database="d", table="t", target_table="D.T", target_pk={"id": "id"}
    )
    df = spark.createDataFrame(
        [(1, '{"a": 1}'), (1, '{"a": 2}'), (2, '{"b": 3}')],
        "id long, j string",
    ).select("id", F.parse_json(F.col("j")).alias("doc"))
    out = etl_import(df, cfg)  # must not raise at analysis
    assert sorted(r["ID"] for r in out.collect()) == [1, 2]
