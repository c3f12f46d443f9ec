"""Projection pipeline tests (P1-P6) against the reference's de-facto
spec, the mytest_user.yml sample mapping (FIXTURES.md F2)."""

from __future__ import annotations

from canal_phoenix_adapter_spark.config import DbMapping, config_from_dict
from canal_phoenix_adapter_spark.functions.enums import enum_decode
from canal_phoenix_adapter_spark.operators.transform import apply_mapping, mapping_columns
from pyspark.sql import functions as F

SAMPLE_YAML_DICT = {
    "dataSourceKey": "defaultDS",
    "destination": "example",
    "groupId": "g1",
    "concurrent": True,
    "dbMapping": {
        "database": "mytest",
        "table": "user",
        "targetTable": "mytest2.user",
        "escapeUpper": True,
        "targetPk": {"id": "id"},
        "mapAll": True,
        "targetColumns": {"id": None, "name": None},
        "excludeColumns": ["password"],
        "enumColumns": {"gender": ["Male", "Female"]},
    },
}


def test_config_from_dict_roundtrip():
    cfg = config_from_dict(SAMPLE_YAML_DICT)
    assert cfg.destination == "example" and cfg.group_id == "g1"
    assert cfg.concurrent is True
    m = cfg.db_mapping
    assert m.target_pk == {"id": "id"}
    assert m.exclude_columns == ["password"]
    assert m.enum_columns == {"gender": ["Male", "Female"]}
    assert cfg.routing_key() == "example-g1_mytest-user"


def test_config_numeric_group_id_coerced_and_bad_target_pk_rejected():
    """(a) An unquoted numeric YAML groupId must load as a STRING:
    comparing a string column to an int raises CAST_INVALID_INPUT
    under ANSI on the first non-numeric groupId envelope sharing the
    stream. (b) A list-shaped targetPk must be rejected: dict(['id'])
    'succeeds' as {'i': 'd'} and keys every merge on a nonexistent
    column."""
    import pytest

    d = dict(SAMPLE_YAML_DICT)
    d["groupId"] = 1
    assert config_from_dict(d).group_id == "1"

    bad = {**SAMPLE_YAML_DICT,
           "dbMapping": {**SAMPLE_YAML_DICT["dbMapping"], "targetPk": ["id"]}}
    with pytest.raises(ValueError, match="targetPk"):
        config_from_dict(bad)


def test_mapping_columns_map_all_with_exclude_and_rename():
    cfg = DbMapping(
        map_all=True,
        target_columns={"uid": "id", "name": None},
        exclude_columns=["Password"],
    )
    cols = mapping_columns(cfg, ["id", "name", "password", "gender"])
    # id consumed by rename, password excluded (case-insensitive)
    assert cols == {"gender": "gender", "uid": "id", "name": "name"}


def test_mapping_columns_explicit_only():
    cfg = DbMapping(map_all=False, target_columns={"uid": "id", "name": None})
    assert mapping_columns(cfg, ["id", "name", "junk"]) == {"uid": "id", "name": "name"}


def test_mapping_columns_case_colliding_target_deduped():
    """A source column differing only in CASE from an explicit rename
    target must not survive as a second identity entry: escape()
    uppercases aliases, so both would emit the same output column name
    (AMBIGUOUS_REFERENCE downstream). Explicit rename wins."""
    cfg = DbMapping(map_all=True, target_columns={"name": "uname"})
    cols = mapping_columns(cfg, ["NAME", "uname", "id"])
    assert cols == {"id": "id", "name": "uname"}


def test_enum_decode_edges(spark):
    # MappingConfig.java:273-287: 1-based; 0, n+1, negative, junk pass through
    df = spark.createDataFrame(
        [("1",), ("2",), ("0",), ("3",), ("-1",), ("abc",), (None,)], "v string"
    )
    rows = df.select(enum_decode(F.col("v"), ["Male", "Female"]).alias("r")).collect()
    assert [r["r"] for r in rows] == ["Male", "Female", "0", "3", "-1", "abc", None]


def test_apply_mapping_full_pipeline(spark):
    cfg = config_from_dict(SAMPLE_YAML_DICT).db_mapping
    df = spark.createDataFrame(
        [(1, "alice", "secret", 1), (2, "bob", "pw", 3)],
        "id int, name string, password string, gender int",
    )
    out = apply_mapping(df, cfg)
    assert sorted(out.columns) == ["GENDER", "ID", "NAME"]  # escapeUpper, password gone
    rows = {r["ID"]: r for r in out.collect()}
    assert rows[1]["GENDER"] == "Male"
    assert rows[2]["GENDER"] == "3"  # out-of-range passthrough


def test_apply_mapping_no_escape(spark):
    cfg = DbMapping(map_all=True, escape_upper=False)
    df = spark.createDataFrame([(1, "x")], "id int, name string")
    assert apply_mapping(df, cfg).columns == ["id", "name"]
