"""JDBC source/sink construction parity (S2/S5/S6/S7/X1/X2): the SQL
strings and reader/writer configuration the reference builds, checked
without a live server (no driver jar ships here; `.load()`/`.save()`
are never called)."""

from __future__ import annotations

from canal_phoenix_adapter_spark.config import DbMapping
from canal_phoenix_adapter_spark.sources.jdbc import (
    delete_sql,
    extract_query,
    jdbc_writer,
    qualified_table,
    read_jdbc_table,
    read_options,
    truncate_sql,
    upsert_sql,
    write_options,
)

CFG = DbMapping(
    database="mytest",
    table="user",
    target_table="mytest2.user",
    target_pk={"id": "id"},
    etl_condition="where sys_time >= '{0}'",
)


def test_qualified_table_escape_upper():
    assert qualified_table(CFG) == '"MYTEST2"."USER"'
    low = DbMapping(target_table="db.t", escape_upper=False)
    assert qualified_table(low) == "db.t"


def test_quote_ident_escapes_embedded_quotes():
    """An identifier containing a double quote must not break out of
    the quoting (SQL smuggling via a hostile yml config; r10 review)."""
    from canal_phoenix_adapter_spark.sources.jdbc import quote_ident

    assert quote_ident('a"b') == '"A""B"'
    assert quote_ident('a"; DROP TABLE x; --') == '"A""; DROP TABLE X; --"'
    # the unquoted branch is parity for sane names only — anything else
    # would be raw SQL in the statement text (r10 fix-review)
    import pytest

    assert quote_ident("db_1", escape_upper=False) == "db_1"
    with pytest.raises(ValueError, match="needs quoting"):
        quote_ident("id = 1; DROP TABLE x; --", escape_upper=False)


def test_extract_query_condition_template():
    assert (
        extract_query(CFG, ["2024-01-01"])
        == "SELECT * FROM mytest.user WHERE sys_time >= '2024-01-01'"
    )
    assert extract_query(DbMapping(database="d", table="t")) == "SELECT * FROM d.t"


def test_extract_query_where_prefix_needs_word_boundary():
    """A condition whose first identifier merely BEGINS with 'where'
    must not be mangled (a bare startswith strip once turned
    wherehouse_id into house_id)."""
    cfg = DbMapping(
        database="d", table="t", etl_condition="where wherehouse_id={0}"
    )
    assert extract_query(cfg, [7]) == "SELECT * FROM d.t WHERE wherehouse_id=7"
    bare = DbMapping(database="d", table="t", etl_condition="wherehouse_id={0}")
    assert extract_query(bare, [7]) == "SELECT * FROM d.t WHERE wherehouse_id=7"


def test_upsert_delete_truncate_sql():
    # UPSERT dialect + quoted-upper identifiers (PhoenixSyncService.java:370-423)
    assert (
        upsert_sql(CFG, ["id", "name"])
        == 'UPSERT INTO "MYTEST2"."USER" ("ID", "NAME") VALUES (?, ?)'
    )
    assert delete_sql(CFG) == 'DELETE FROM "MYTEST2"."USER" WHERE "ID" = ?'
    comp = DbMapping(target_table="d.t", target_pk={"a": "a", "b": "b"})
    assert delete_sql(comp) == 'DELETE FROM "D"."T" WHERE "A" = ? AND "B" = ?'
    assert truncate_sql(CFG) == 'DELETE FROM "MYTEST2"."USER"'


def test_partitioned_reader_options(spark):
    opts = read_options(
        "jdbc:mysql://h/db",
        CFG,
        params=["2024-01-01"],
        partition_column="id",
        lower_bound=0,
        upper_bound=100000,
        num_partitions=8,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "8"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "100000"
    # partitioned read folds the conditioned extract into a derived table
    assert opts["dbtable"].startswith("(SELECT * FROM mytest.user WHERE")
    # unpartitioned read ships the extract as a plain query
    assert "query" in read_options("jdbc:mysql://h/db", CFG)
    # reader construction itself succeeds (no load)
    assert read_jdbc_table(
        spark, url="jdbc:mysql://h/db", cfg=CFG, partition_column="id",
        lower_bound=0, upper_bound=10,
    ) is not None


def test_writer_batchsize(spark):
    opts = write_options("jdbc:phoenix:h", CFG, batch_size=5000)
    assert opts["batchsize"] == "5000"
    assert opts["dbtable"] == '"MYTEST2"."USER"'
    df = spark.range(3).withColumnRenamed("id", "v")
    assert jdbc_writer(df, url="jdbc:phoenix:h", cfg=CFG) is not None


def test_qualified_table_target_db_qualifies_undotted_name():
    """An undotted targetTable with targetDb set must qualify as
    targetDb.table (SyncUtil.java:258-273) — ignoring targetDb would
    write into the default schema while notify announces targetDb."""
    cfg = DbMapping(target_table="user", target_db="tgt")
    assert qualified_table(cfg) == '"TGT"."USER"'
    # the reference prepends targetDb WHENEVER set, even for a dotted
    # targetTable (SyncUtil.getDbTableName, SyncUtil.java:258-273)
    dotted = DbMapping(target_table="other.user", target_db="tgt")
    assert qualified_table(dotted) == '"TGT"."OTHER"."USER"'
