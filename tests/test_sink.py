"""Executor-side Phoenix write loop (sinks/phoenix.py) vs the
reference's BatchExecutor semantics (support/BatchExecutor.java:21-105,
dispatch at PhoenixSyncService.java:96-132, :234-254, :370-513)."""

from __future__ import annotations

import json
import os

import pytest

from canal_phoenix_adapter_spark.config import DbMapping, MappingConfig
from canal_phoenix_adapter_spark.sinks.phoenix import (
    BatchExecutor,
    TargetSchemaError,
    apply_partition,
    write_changes,
)


class FakeCursor:
    def __init__(self, conn):
        self.conn = conn
        self.rowcount = 1

    def execute(self, sql, params=None):
        if self.conn.fail_on and self.conn.fail_on in sql and not self.conn.healed:
            raise self.conn.fail_with
        self.conn.log.append(("execute", sql, list(params or [])))

    def close(self):
        pass


class FakeConnection:
    """Recording DB-API connection; optionally fails on a SQL substring
    until `healed` flips (the schema-heal-replay scenario)."""

    def __init__(self, fail_on=None, fail_with=None):
        self.log = []
        self.fail_on = fail_on
        self.fail_with = fail_with or TargetSchemaError("boom")
        self.healed = False

    def cursor(self):
        return FakeCursor(self)

    def commit(self):
        self.log.append(("commit",))

    def rollback(self):
        self.log.append(("rollback",))

    def close(self):
        self.log.append(("close",))


def make_cfg(concurrent=False, skip_missing=False, composite=False):
    pk = {"ID": "id", "SUB": "sub"} if composite else {"ID": "id"}
    return MappingConfig(
        destination="canal",
        concurrent=concurrent,
        db_mapping=DbMapping(
            database="mytest",
            table="user",
            target_table="MYTEST.USER",
            target_pk=pk,
            skip_missing=skip_missing,
        ),
    )


def ops_of(log):
    return [e[0] for e in log]


def sqls_of(log):
    return [e[1] for e in log if e[0] == "execute"]


def test_upsert_then_commit():
    conn = FakeConnection()
    cfg = make_cfg()
    n = apply_partition(
        [{"seq": 1, "op": "INSERT", "id": 7, "name": "a"}], cfg, lambda: conn
    )
    assert n == 1
    sql = sqls_of(conn.log)[0]
    assert sql.startswith('UPSERT INTO "MYTEST"."USER" (')
    assert '"ID"' in sql and '"NAME"' in sql
    assert conn.log[0][2] == [7, "a"]
    assert ops_of(conn.log) == ["execute", "commit", "close"]


def test_pk_change_deletes_old_key_first():
    """UPDATE that moved the PK: DELETE old key, THEN upsert the new
    image (PhoenixSyncService.java:425-456 order)."""
    conn = FakeConnection()
    apply_partition(
        [{"seq": 2, "op": "UPDATE", "id": 8, "old_id": 7, "name": "b"}],
        make_cfg(),
        lambda: conn,
    )
    sqls = sqls_of(conn.log)
    assert sqls[0].startswith('DELETE FROM "MYTEST"."USER" WHERE "ID" = ?')
    assert conn.log[0][2] == [7]  # old key
    assert sqls[1].startswith("UPSERT INTO")
    assert ops_of(conn.log) == ["execute", "execute", "commit", "close"]


def test_update_without_pk_change_skips_delete():
    conn = FakeConnection()
    apply_partition(
        [{"seq": 2, "op": "UPDATE", "id": 7, "old_id": None, "name": "b"}],
        make_cfg(),
        lambda: conn,
    )
    assert ops_of(conn.log) == ["execute", "commit", "close"]


def test_delete_uses_composite_pk_predicate():
    conn = FakeConnection()
    apply_partition(
        [{"seq": 3, "op": "DELETE", "id": 7, "sub": 2, "name": "x"}],
        make_cfg(composite=True),
        lambda: conn,
    )
    sql = sqls_of(conn.log)[0]
    assert sql == 'DELETE FROM "MYTEST"."USER" WHERE "ID" = ? AND "SUB" = ?'
    assert conn.log[0][2] == [7, 2]


def test_truncate_and_unknown_op():
    conn = FakeConnection()
    n = apply_partition(
        [
            {"seq": 1, "op": "TRUNCATE", "id": None, "name": None},
            {"seq": 2, "op": "CREATE", "id": 1, "name": "ddl-ish"},  # ignored
        ],
        make_cfg(),
        lambda: conn,
    )
    assert n == 2
    assert sqls_of(conn.log) == ['DELETE FROM "MYTEST"."USER"']


def test_rollback_on_error_and_raise():
    conn = FakeConnection(fail_on="UPSERT", fail_with=RuntimeError("io"))
    with pytest.raises(RuntimeError, match="io"):
        apply_partition(
            [{"seq": 1, "op": "INSERT", "id": 1, "name": "a"}],
            make_cfg(),
            lambda: conn,
        )
    assert ops_of(conn.log) == ["rollback", "close"]


def test_schema_error_heals_and_replays():
    """ColumnNotFound-style failure: rollback -> heal -> replay the
    whole partition -> commit (PhoenixSyncService.java:103-131)."""
    conn = FakeConnection(fail_on="UPSERT")

    def heal(c):
        c.healed = True
        c.log.append(("heal",))
        return True

    n = apply_partition(
        [
            {"seq": 1, "op": "INSERT", "id": 1, "name": "a"},
            {"seq": 2, "op": "DELETE", "id": 9, "name": None},
        ],
        make_cfg(),
        lambda: conn,
        heal=heal,
    )
    assert n == 2
    # first attempt: DELETE for seq-2 never ran (fail at first UPSERT);
    # then rollback, heal, full replay of both items, commit.
    assert ops_of(conn.log) == [
        "rollback", "heal", "execute", "execute", "commit", "close",
    ]


def test_schema_error_without_heal_raises():
    conn = FakeConnection(fail_on="UPSERT")
    with pytest.raises(TargetSchemaError):
        apply_partition(
            [{"seq": 1, "op": "INSERT", "id": 1, "name": "a"}],
            make_cfg(),
            lambda: conn,
        )
    assert ops_of(conn.log) == ["rollback", "close"]


def test_skip_missing_drops_column_vs_raises():
    """skipMissing=true: a column absent from the target is skipped
    with the rest written; false: hard error
    (PhoenixSyncService.java:399-411, config/MappingConfig.java:107)."""
    conn = FakeConnection()
    item = {"seq": 1, "op": "INSERT", "id": 1, "name": "a", "extra": "z"}
    apply_partition(
        [item], make_cfg(skip_missing=True), lambda: conn,
        target_columns={"ID", "NAME"},
    )
    sql = sqls_of(conn.log)[0]
    assert '"EXTRA"' not in sql and '"NAME"' in sql
    assert conn.log[0][2] == [1, "a"]

    with pytest.raises(TargetSchemaError, match="EXTRA"):
        apply_partition(
            [dict(item)], make_cfg(skip_missing=False), lambda: conn,
            target_columns={"ID", "NAME"},
        )


def test_commit_batch_flushes_every_n():
    conn = FakeConnection()
    items = [
        {"seq": i, "op": "INSERT", "id": i, "name": str(i)} for i in range(5)
    ]
    apply_partition([dict(i) for i in items], make_cfg(), lambda: conn, commit_batch=2)
    # commits after rows 2 and 4, final commit flushes the tail
    assert ops_of(conn.log) == [
        "execute", "execute", "commit",
        "execute", "execute", "commit",
        "execute", "commit", "close",
    ]


def test_batch_executor_counts_and_resets():
    conn = FakeConnection()
    ex = BatchExecutor(lambda: conn)
    ex.execute("UPSERT INTO t VALUES (?)", [1])
    ex.execute("UPSERT INTO t VALUES (?)", [2])
    assert ex.idx == 2
    ex.commit()
    assert ex.idx == 0
    ex.execute("DELETE FROM t", [])
    ex.rollback()
    assert ex.idx == 0
    ex.close()
    ex.close()  # idempotent


def apply_stmt(state, sql, params, width=2):
    """Interpret ONE recorded sink statement the way Phoenix would
    (last-writer-wins upsert / keyed delete / truncate). THE shared
    interpreter — three hand-rolled copies once risked drifting apart
    (r8 test review)."""
    if sql.startswith("UPSERT"):
        state[params[0]] = params[1] if width == 1 else tuple(
            params[1:1 + width])
    elif sql.startswith("DELETE") and "WHERE" in sql:
        state.pop(params[0], None)
    elif sql.startswith("DELETE") or sql.startswith("TRUNCATE"):
        state.clear()


def replay_sink_files(out_dir):
    """Fold every statement recorded by _recording_factory into the
    final (state, n_statements) pair."""
    state, n = {}, 0
    for fname in sorted(os.listdir(out_dir)):
        fp = os.path.join(str(out_dir), fname)
        for line in open(fp, encoding="utf-8").read().splitlines():
            rec = json.loads(line)
            n += 1
            apply_stmt(state, rec["sql"], rec["params"])
    return state, n


def _recording_factory(out_dir):
    """Picklable executor-side connection factory: records applied
    statements as jsonl, one file per partition (pid+id keyed)."""

    class JsonlCursor:
        def __init__(self, c):
            self.c = c

        def execute(self, sql, params=None):
            self.c.rows.append({"sql": sql, "params": list(params or [])})

        def close(self):
            pass

    class JsonlConn:
        def __init__(self):
            import uuid

            self.rows = []
            self.uid = uuid.uuid4().hex

        def cursor(self):
            return JsonlCursor(self)

        def commit(self):
            # uuid, NOT id(self): a reused python worker can allocate a
            # later partition's connection at a freed address, and a
            # pid+id filename collision would append two partitions'
            # streams into one file — masking exactly the key-split
            # defect the concurrent-order test exists to catch.
            path = os.path.join(out_dir, f"p{os.getpid()}_{self.uid}.jsonl")
            with open(path, "a", encoding="utf-8") as f:
                for r in self.rows:
                    f.write(json.dumps(r) + "\n")
            self.rows = []

        def rollback(self):
            self.rows = []

        def close(self):
            pass

    def factory():
        return JsonlConn()

    return factory


def test_write_changes_end_to_end(spark, tmp_path):  # noqa: F811
    """foreachPartition path on a real DataFrame: every change row is
    applied exactly once, per-key events stay ordered by seq, and
    serial mode (concurrent=False) produces ONE partition stream."""
    out = tmp_path / "applied"
    out.mkdir()
    rows = [
        (1, "INSERT", 1, None, "a"),
        (2, "UPDATE", 1, None, "b"),
        (3, "INSERT", 2, None, "c"),
        (4, "UPDATE", 3, 2, "moved"),  # PK change 2 -> 3
        (5, "DELETE", 1, None, None),
    ]
    df = spark.createDataFrame(
        rows, "seq bigint, op string, id bigint, old_id bigint, name string"
    )
    write_changes(df, make_cfg(concurrent=False), _recording_factory(str(out)))

    files = sorted(os.listdir(out))
    assert len(files) == 1  # serial mode: one partition, one connection
    applied = [
        json.loads(line)
        for line in open(out / files[0], encoding="utf-8").read().splitlines()
    ]
    # 5 events, one extra DELETE for the PK change
    assert len(applied) == 6
    upserts = [a for a in applied if a["sql"].startswith("UPSERT")]
    deletes = [a for a in applied if a["sql"].startswith("DELETE")]
    assert len(upserts) == 4 and len(deletes) == 2
    # PK-change: DELETE of old key 2 immediately precedes UPSERT of 3
    i = next(j for j, a in enumerate(applied) if a["params"] == [2])
    assert applied[i]["sql"].startswith("DELETE")
    assert applied[i + 1]["sql"].startswith("UPSERT") and 3 in applied[i + 1]["params"]


def test_write_changes_concurrent_keeps_key_order(spark, tmp_path):  # noqa: F811
    """concurrent=True: many partitions, but all events of one key sit
    in one partition in seq order (C8 per-key ordered parallelism)."""
    out = tmp_path / "applied"
    out.mkdir()
    rows = [
        (seq, "UPDATE" if seq % 3 else "INSERT", uid, None, f"v{seq}")
        for seq, uid in ((s, s % 7) for s in range(1, 43))
    ]
    df = spark.createDataFrame(
        rows, "seq bigint, op string, id bigint, old_id bigint, name string"
    )
    write_changes(
        df, make_cfg(concurrent=True), _recording_factory(str(out)), num_partitions=4
    )
    seen: dict[int, list[int]] = {}
    owner: dict[int, str] = {}
    for fname in os.listdir(out):
        for line in open(out / fname, encoding="utf-8").read().splitlines():
            rec = json.loads(line)
            uid, val = rec["params"][0], rec["params"][1]
            seq = int(val[1:])
            assert owner.setdefault(uid, fname) == fname, "key split across partitions"
            seen.setdefault(uid, []).append(seq)
    assert sum(len(v) for v in seen.values()) == 42
    for uid, seqs in seen.items():
        assert seqs == sorted(seqs), f"key {uid} applied out of order"


def test_write_time_enum_decode():
    """checkColumnValue parity (MappingConfig.java:277-287): 1-based
    enum index -> label at write time; out-of-range passes through."""
    cfg = make_cfg()
    cfg.db_mapping.enum_columns = {"GENDER": ["Male", "Female"]}
    conn = FakeConnection()
    apply_partition(
        [
            {"seq": 1, "op": "INSERT", "id": 1, "gender": "2"},
            {"seq": 2, "op": "INSERT", "id": 2, "gender": "9"},  # out of range
            {"seq": 3, "op": "INSERT", "id": 3, "gender": None},
        ],
        cfg,
        lambda: conn,
    )
    vals = [e[2] for e in conn.log if e[0] == "execute"]
    assert vals == [[1, "Female"], [2, "9"], [3, None]]


def test_enum_pk_delete_predicate_decoded():
    """checkColumnValue applies to PK PREDICATES too (the reference
    runs it inside getPkVal, PhoenixSyncService.java:589): an
    enum-typed PK stores the decoded label, so a DELETE binding the
    raw index would never match — and the row would never die."""
    cfg = make_cfg()
    cfg.db_mapping.target_pk = {"status": None}
    cfg.db_mapping.enum_columns = {"STATUS": ["active", "closed"]}
    conn = FakeConnection()
    apply_partition(
        [
            {"seq": 1, "op": "INSERT", "id": 1, "status": "1"},
            {"seq": 2, "op": "DELETE", "id": 1, "status": "1"},
            # PK-change: old status 1 -> new status 2; the pre-delete
            # must bind the decoded OLD label
            {"seq": 3, "op": "UPDATE", "id": 2, "status": "2",
             "old_status": "1"},
        ],
        cfg,
        lambda: conn,
    )
    stmts = [(e[1], e[2]) for e in conn.log if e[0] == "execute"]
    deletes = [v for s, v in stmts if s.startswith("DELETE")]
    assert deletes == [["active"], ["active"]]  # decoded, not '1'


def test_etl_to_sink_backfills_through_writer(spark, tmp_path):
    """S2 -> S5 executed end-to-end: conditional extract + mapping +
    idempotent dedup, then row-wise UPSERTs through the executor-side
    loop, EtlResult envelope back."""
    from canal_phoenix_adapter_spark.operators.etl import etl_to_sink

    out = tmp_path / "applied"
    out.mkdir()
    src = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 50), (2, "b", 50), (3, "c", 500)],
        "id long, name string, sys_time long",
    )
    cfg = DbMapping(
        database="d", table="t", target_table="MYTEST.USER",
        target_pk={"ID": "id"}, etl_condition="where sys_time >= {0}",
    )
    res = etl_to_sink(src, cfg, _recording_factory(str(out)), params=["50"])
    assert res["succeeded"] is True and res["rowsProcessed"] == 2

    applied = []
    for fname in os.listdir(out):
        for line in open(out / fname, encoding="utf-8").read().splitlines():
            applied.append(json.loads(line))
    upserted = {a["params"][0] for a in applied if a["sql"].startswith("UPSERT")}
    assert upserted == {2, 3}  # filtered to sys_time>=50, deduped on PK


def test_etl_to_sink_with_renames_does_not_remap(spark, tmp_path):
    """The sink side of etl_to_sink must treat rows as ALREADY
    target-shaped: re-applying the config's renames to mapped rows
    emitted a duplicate target column bound to None, and a renamed PK
    crashed the repartition (the source name no longer exists)."""
    from canal_phoenix_adapter_spark.operators.etl import etl_to_sink

    out = tmp_path / "applied2"
    out.mkdir()
    src = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 2)], "id long, uname string, gender long"
    )
    cfg = DbMapping(
        database="d", table="t", target_table="MYTEST.USER",
        target_pk={"UID": "id"},                  # PK renamed
        target_columns={"uid": "id", "name": "uname"},
        enum_columns={"GENDER": ["Male", "Female"]},
    )
    res = etl_to_sink(src, cfg, _recording_factory(str(out)))
    assert res["succeeded"] is True and res["rowsProcessed"] == 2

    applied = []
    for fname in os.listdir(out):
        for line in open(out / fname, encoding="utf-8").read().splitlines():
            applied.append(json.loads(line))
    ups = [a for a in applied if a["sql"].startswith("UPSERT")]
    assert len(ups) == 2
    for a in ups:
        # no duplicate column, no None clobber; enum decoded ONCE
        cols = a["sql"].split("(")[1].split(")")[0].split(", ")
        assert len(cols) == len(set(cols)), a["sql"]
        assert None not in a["params"], a
    assert {a["params"][a_cols.index('"GENDER"')] for a in ups
            for a_cols in [a["sql"].split("(")[1].split(")")[0].split(", ")]} \
        == {"Male", "Female"}


def test_replay_statement_failure_rolls_back():
    """A statement failure DURING the post-heal replay (not just at
    its commit) must roll back before the connection closes — the
    documented second-failure contract; without it the connection
    closed with an open transaction."""
    import pytest

    class TwoPhaseFail(FakeConnection):
        """Fails UPSERTs until healed; after heal, fails DELETEs."""

        def cursor(self):
            conn = self

            class C(FakeCursor):
                def execute(self, sql, params=None):
                    if conn.healed and sql.startswith("DELETE"):
                        raise RuntimeError("replay statement boom")
                    super().execute(sql, params)

            return C(conn)

    conn = TwoPhaseFail(fail_on="UPSERT")

    def heal(c):
        c.healed = True
        c.log.append(("heal",))
        return True

    with pytest.raises(RuntimeError, match="replay statement boom"):
        apply_partition(
            [
                {"seq": 1, "op": "INSERT", "id": 1, "name": "a"},
                {"seq": 2, "op": "DELETE", "id": 9, "name": None},
            ],
            make_cfg(),
            lambda: conn,
            heal=heal,
        )
    # first failure: rollback + heal; replay executes the UPSERT, dies
    # on the DELETE -> rollback again, then close
    assert ops_of(conn.log) == [
        "rollback", "heal", "execute", "rollback", "close",
    ]


def test_etl_to_sink_targetpk_only_rename(spark, tmp_path):
    """A targetPk-only rename (PK declared UID<-id with NO
    targetColumns entry) rides through mapAll under the escaped
    SOURCE name; the sink must key its repartition on the column the
    mapped rows actually carry — keying on the escaped TARGET name
    crashed the backfill on an unresolvable column (r3 ADVICE)."""
    from canal_phoenix_adapter_spark.operators.etl import etl_to_sink

    out = tmp_path / "applied_pkonly"
    out.mkdir()
    src = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    cfg = DbMapping(
        database="d", table="t", target_table="MYTEST.USER",
        target_pk={"UID": "id"}, map_all=True,
    )
    res = etl_to_sink(src, cfg, _recording_factory(str(out)))
    assert res["errors"] == []
    assert res["succeeded"] is True and res["rowsProcessed"] == 2
    applied = []
    for fname in os.listdir(out):
        for line in open(out / fname, encoding="utf-8").read().splitlines():
            applied.append(json.loads(line))
    ups = [a for a in applied if a["sql"].startswith("UPSERT")]
    assert len(ups) == 2


def test_upsert_excludes_is_ddl_column():
    """explode_dml-shaped rows carry is_ddl routing metadata; the sink's
    image columns come from merge._image_cols (one definition), so
    IS_DDL must never reach an UPSERT column list — a local copy of the
    exclusion once drifted exactly here and every epoch aborted on the
    target-schema check (r8 review)."""
    conn = FakeConnection()
    apply_partition(
        [{"seq": 1, "op": "INSERT", "id": 7, "name": "a", "is_ddl": False}],
        make_cfg(),
        lambda: conn,
    )
    ups = [s for s in sqls_of(conn.log) if s.startswith("UPSERT")]
    assert len(ups) == 1
    assert "IS_DDL" not in ups[0].upper()


def test_apply_loop_resolves_config_casing_against_row_casing():
    """Config-cased source names (explicit targetColumns / targetPk
    values) vs DataFrame column casing: Spark resolves these case-
    insensitively everywhere upstream, so the executor-side dict
    lookups must too — a case-sensitive item.get() silently UPSERTed
    NULLs and bound NULL DELETE predicates (r10 review)."""
    conn = FakeConnection()
    cfg = MappingConfig(
        destination="canal",
        db_mapping=DbMapping(
            database="d", table="t", target_table="d.t",
            map_all=False,
            target_columns={"ID": "Id", "NAME": "Name"},
            target_pk={"ID": "Id"},
        ),
    )
    n = apply_partition(
        [
            {"seq": 1, "op": "INSERT", "id": 7, "name": "alice"},
            {"seq": 2, "op": "DELETE", "id": 7, "name": None},
        ],
        cfg,
        lambda: conn,
    )
    assert n == 2
    executes = [e for e in conn.log if e[0] == "execute"]
    upsert_params = executes[0][2]
    delete_params = executes[1][2]
    assert 7 in upsert_params and "alice" in upsert_params  # not NULLs
    assert delete_params == [7]                             # predicate bound


def test_ci_view_raises_on_case_colliding_columns():
    """Two source columns differing only by case collapsed to
    whichever dict order iterated last — arbitrary values written with
    no signal. _ci_view now raises naming the clash (r10 ADVICE)."""
    from canal_phoenix_adapter_spark.sinks.phoenix import _ci_view

    assert _ci_view({"Id": 1, "name": "a"}) == {"id": 1, "name": "a"}
    with pytest.raises(ValueError, match=r"\['ID', 'Id'\]"):
        _ci_view({"Id": 1, "ID": 2, "name": "a"})


def test_replay_suppresses_commit_batch_flushes():
    """commit_batch flushes must NOT fire during the heal replay: a
    flushed prefix (including any TRUNCATE in it) would survive the
    final rollback-and-raise, breaking the documented second-failure
    contract (r10 review). The replayed partition is ONE transaction."""
    import pytest

    class ReplayFailConn(FakeConnection):
        def __init__(self):
            super().__init__()
            self.phase = 1

        def cursor(self):
            conn = self

            class C(FakeCursor):
                def execute(self, sql, params=None):
                    if conn.phase == 1 and "UPSERT" in sql:
                        raise TargetSchemaError("missing col")
                    if conn.phase == 2 and "DELETE" in sql:
                        raise RuntimeError("replay dies")
                    conn.log.append(("execute", sql, list(params or [])))

            return C(conn)

    conn = ReplayFailConn()

    def heal(c):
        c.phase = 2
        c.log.append(("heal",))
        return True

    with pytest.raises(RuntimeError, match="replay dies"):
        apply_partition(
            [
                {"seq": 1, "op": "INSERT", "id": 1, "name": "a"},
                {"seq": 2, "op": "INSERT", "id": 2, "name": "b"},
                {"seq": 3, "op": "DELETE", "id": 9, "name": None},
            ],
            make_cfg(),
            lambda: conn,
            commit_batch=1,  # would flush after EVERY statement
            heal=heal,
        )
    ops = ops_of(conn.log)
    # first pass fails at the first UPSERT -> rollback, heal; replay
    # executes two UPSERTs WITHOUT intermediate commits, dies on the
    # DELETE -> rollback and raise. Zero commits anywhere.
    assert "commit" not in ops
    assert ops == ["rollback", "heal", "execute", "execute", "rollback", "close"]
