"""Type-coercion matrix: loosely-typed (Canal delivers strings) ->
typed target columns.

Re-expresses the reference's JDBC-type-directed conversion
(support/SyncUtil.java:61-256) and its edge semantics:

* unparseable values -> NULL (SyncUtil.java:203-207) — hence the
  explicit ``try_cast`` everywhere (Spark 4 runs ANSI-on by default,
  where a plain cast would *raise*; try_cast restores NULL-on-garbage).
* boolean from string: '0' -> false, any other non-null string -> true;
  from number: != 0 (SyncUtil.java:63-76).
* MySQL zero-dates '0000-00-00...' pass through as raw strings instead
  of being parsed (SyncUtil.java:199-213 DATE, :237-251 TIMESTAMP).

All builders return Column expressions (JVM-side, codegen'd): there is
no Python in the row path, so the coercion layer costs the same as any
built-in projection at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def boolean_lenient(col: Column, source_type: T.DataType | None = None) -> Column:
    """Boolean coercion (SyncUtil.java:63-76): string '0' -> false,
    any other string -> true; numeric != 0 -> true; NULL -> NULL."""
    if source_type is not None and not isinstance(source_type, T.StringType):
        return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(
            col.cast("double") != 0
        )
    # String input: '0' false, everything else true. Numeric-looking
    # strings still follow the reference's string rule ('00' -> true).
    return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(col != "0")


def zero_date_lenient(col: Column, kind: str = "timestamp") -> Column:
    """Zero-date passthrough (SyncUtil.java:199-213, :237-251): values
    starting with '0000-00-00' are forwarded verbatim; parseable dates
    are canonicalized; garbage -> NULL.

    Because one DataFrame column has one type, the lenient variant is
    typed *string* (canonical ISO format for real dates). Use
    ``coerce_to`` for the strictly-typed date/timestamp column where
    zero dates become NULL.
    """
    s = col.cast("string")
    if kind == "date":
        parsed = s.try_cast("date").cast("string")
    else:
        parsed = s.try_cast("timestamp").cast("string")
    return F.when(s.startswith("0000-00-00"), s).otherwise(parsed)


def coerce_to(col: Column, target: T.DataType) -> Column:
    """Coerce an arbitrary column to ``target``, NULL on unparseable —
    the Spark expression of SyncUtil.setPStmt's per-JDBC-type matrix
    (support/SyncUtil.java:61-256). Unsupported/any -> string
    (TypeUtil.java:133-139 falls back to VARCHAR)."""
    if isinstance(target, T.BooleanType):
        return boolean_lenient(col)
    if isinstance(
        target,
        (
            T.ByteType,
            T.ShortType,
            T.IntegerType,
            T.LongType,
            T.FloatType,
            T.DoubleType,
            T.DecimalType,
            T.DateType,
            T.TimestampType,
            T.TimestampNTZType,
            T.BinaryType,
        ),
    ):
        base = col.cast("string") if isinstance(target, T.BinaryType) else col
        return base.try_cast(target.simpleString())
    if isinstance(target, (T.ArrayType, T.MapType, T.StructType)):
        # complex targets: lenient element-wise coercion isn't part of
        # the reference matrix (flat rows only, SURVEY §1.3); a plain
        # try_cast covers the project-onto-schema contract instead of
        # silently stringifying the column.
        return col.try_cast(target.simpleString())
    return col.cast("string")


def coerce_to_schema(df, schema: T.StructType, keep_extra: bool = False):
    """Project ``df`` onto ``schema``'s names/types using the lenient
    matrix. Columns missing from ``df`` become typed NULLs (schema-heal
    semantics, PhoenixSyncService.java:103-131); extra columns are
    dropped unless ``keep_extra``."""
    have = {f.name.lower(): f.name for f in df.schema.fields}
    cols = []
    for field in schema.fields:
        src = have.get(field.name.lower())
        if src is None:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        else:
            cols.append(coerce_to(F.col(src), field.dataType).alias(field.name))
    if keep_extra:
        wanted = {f.name.lower() for f in schema.fields}
        cols += [F.col(f.name) for f in df.schema.fields if f.name.lower() not in wanted]
    return df.select(*cols)
