"""Type-coercion matrix tests (FIXTURES.md F5; SyncUtil.java:61-256
semantics)."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from canal_phoenix_adapter_spark.functions.coerce import (
    boolean_lenient,
    coerce_to,
    coerce_to_schema,
    zero_date_lenient,
)


def _one(spark, value, expr):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(expr.alias("r")).first()["r"]


def test_boolean_string_rule(spark):
    # SyncUtil.java:63-76: '0' -> false, any other string -> true
    assert _one(spark, "0", boolean_lenient(F.col("v"))) is False
    assert _one(spark, "1", boolean_lenient(F.col("v"))) is True
    assert _one(spark, "00", boolean_lenient(F.col("v"))) is True
    assert _one(spark, "false", boolean_lenient(F.col("v"))) is True
    assert _one(spark, None, boolean_lenient(F.col("v"))) is None


def test_boolean_numeric_rule(spark):
    df = spark.createDataFrame([(0,), (2,), (None,)], "v int")
    rows = df.select(boolean_lenient(F.col("v"), T.IntegerType()).alias("r")).collect()
    assert [r["r"] for r in rows] == [False, True, None]


def test_numeric_garbage_to_null(spark):
    assert _one(spark, "123", coerce_to(F.col("v"), T.IntegerType())) == 123
    assert _one(spark, "junk", coerce_to(F.col("v"), T.IntegerType())) is None
    assert _one(spark, "1.5", coerce_to(F.col("v"), T.DoubleType())) == 1.5


def test_decimal(spark):
    r = _one(spark, "12.34", coerce_to(F.col("v"), T.DecimalType(12, 2)))
    assert r == Decimal("12.34")
    assert _one(spark, "x", coerce_to(F.col("v"), T.DecimalType(12, 2))) is None


def test_date_and_timestamp(spark):
    assert _one(spark, "2024-01-15", coerce_to(F.col("v"), T.DateType())) == datetime.date(2024, 1, 15)
    assert _one(spark, "garbage", coerce_to(F.col("v"), T.DateType())) is None
    ts = _one(spark, "2024-01-15 10:30:00", coerce_to(F.col("v"), T.TimestampType()))
    assert ts == datetime.datetime(2024, 1, 15, 10, 30)


def test_zero_date_passthrough(spark):
    # SyncUtil.java:199-213: zero-dates forwarded verbatim, garbage NULL
    assert _one(spark, "0000-00-00", zero_date_lenient(F.col("v"), "date")) == "0000-00-00"
    assert _one(spark, "0000-00-00 00:00:00", zero_date_lenient(F.col("v"))) == "0000-00-00 00:00:00"
    assert _one(spark, "not a date", zero_date_lenient(F.col("v"))) is None
    assert _one(spark, "2024-02-29", zero_date_lenient(F.col("v"), "date")) == "2024-02-29"


def test_coerce_to_ntz_timestamp(spark):
    """TimestampNTZType must coerce like TimestampType, not silently
    stringify (the project-onto-schema contract)."""
    df = spark.createDataFrame([("2024-03-01 10:30:00",), ("garbage",)], "ts string")
    out = df.select(coerce_to(F.col("ts"), T.TimestampNTZType()).alias("ts"))
    assert out.schema["ts"].dataType == T.TimestampNTZType()
    vals = [r["ts"] for r in out.collect()]
    assert vals[0] is not None and vals[1] is None  # lenient NULL on garbage


def test_coerce_to_schema_missing_and_extra(spark):
    df = spark.createDataFrame([("1", "x", "z")], "a string, b string, zz string")
    schema = T.StructType(
        [
            T.StructField("A", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.DoubleType()),
        ]
    )
    out = coerce_to_schema(df, schema)
    assert out.columns == ["A", "b", "c"]
    row = out.first()
    assert row["A"] == 1 and row["b"] == "x" and row["c"] is None
