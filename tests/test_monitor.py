"""Config hot reload (S10) vs monitor/PhoenixConfigMonitor.java:35-163:
create/change/delete events, outerAdapterKey change rejection, bad
YAML isolation."""

from __future__ import annotations

import os
import textwrap
import time

from canal_phoenix_adapter_spark.monitor import ConfigMonitor


def write_yaml(dirpath, name, database="mytest", table="user", target="M.T",
               outer_key=None, extra=""):
    body = textwrap.dedent(
        f"""
        destination: example
        {f'outerAdapterKey: {outer_key}' if outer_key else ''}
        dbMapping:
          database: {database}
          table: {table}
          targetTable: {target}
          targetPk:
            id: id
        {extra}
        """
    )
    path = os.path.join(dirpath, name)
    with open(path, "w", encoding="utf-8") as f:
        f.write(body)
    return path


def bump_mtime(path):
    st = os.stat(path)
    os.utime(path, (st.st_atime, st.st_mtime + 10))


def test_create_change_delete_cycle(tmp_path):
    mon = ConfigMonitor(str(tmp_path))
    assert mon.poll() == {"created": [], "changed": [], "deleted": []}

    p = write_yaml(str(tmp_path), "user.yml")
    ev = mon.poll()
    assert ev["created"] == ["user.yml"]
    assert mon.configs["user.yml"].db_mapping.target_table == "M.T"
    assert "user.yml" in mon.configs_for("example_mytest-user")

    write_yaml(str(tmp_path), "user.yml", target="M.T2")
    bump_mtime(p)
    ev = mon.poll()
    assert ev["changed"] == ["user.yml"]
    assert mon.configs["user.yml"].db_mapping.target_table == "M.T2"

    os.remove(p)
    ev = mon.poll()
    assert ev["deleted"] == ["user.yml"]
    assert mon.configs == {} and mon.configs_for("example_mytest-user") == {}


def test_outer_adapter_key_change_rejected(tmp_path):
    p = write_yaml(str(tmp_path), "user.yml", outer_key="k1")
    mon = ConfigMonitor(str(tmp_path), outer_adapter_key="k1")
    mon.poll()
    assert mon.configs["user.yml"].outer_adapter_key == "k1"

    write_yaml(str(tmp_path), "user.yml", outer_key="k2", target="M.T9")
    bump_mtime(p)
    ev = mon.poll()
    assert ev["changed"] == []  # rejected, old config retained
    assert mon.configs["user.yml"].outer_adapter_key == "k1"
    assert mon.configs["user.yml"].db_mapping.target_table == "M.T"


def test_key_filter_skips_other_adapters(tmp_path):
    write_yaml(str(tmp_path), "mine.yml", outer_key="k1")
    write_yaml(str(tmp_path), "other.yml", table="t2", outer_key="k2")
    write_yaml(str(tmp_path), "unkeyed.yml", table="t3")
    mon = ConfigMonitor(str(tmp_path), outer_adapter_key="k1")
    mon.poll()
    assert set(mon.configs) == {"mine.yml"}


def test_bad_yaml_does_not_kill_the_loop(tmp_path):
    write_yaml(str(tmp_path), "good.yml")
    with open(os.path.join(str(tmp_path), "bad.yml"), "w", encoding="utf-8") as f:
        f.write("dbMapping:\n  database: d\n")  # missing table/targetTable
    ev = ConfigMonitor(str(tmp_path)).poll()
    assert ev["created"] == ["good.yml"]


def test_routing_key_groups_multiple_configs(tmp_path):
    write_yaml(str(tmp_path), "a.yml", target="M.A")
    write_yaml(str(tmp_path), "b.yml", target="M.B")
    mon = ConfigMonitor(str(tmp_path))
    mon.poll()
    grouped = mon.configs_for("example_mytest-user")
    assert set(grouped) == {"a.yml", "b.yml"}


def test_monitor_restart_after_stop(tmp_path):
    """stop() then start() must resume polling: without clearing the
    stop event, the second start() launches a thread that exits after
    zero polls while the monitor looks started."""
    mon = ConfigMonitor(str(tmp_path))
    mon.start(interval_sec=0.05)
    mon.stop()
    assert mon._thread is None
    mon.start(interval_sec=0.05)
    try:
        write_yaml(str(tmp_path), "late.yml")
        deadline = time.time() + 5
        while time.time() < deadline and "late.yml" not in mon.configs:
            time.sleep(0.05)
        assert "late.yml" in mon.configs, "restarted monitor never polled"
    finally:
        mon.stop()


def test_failed_load_is_retried_even_at_identical_stat(tmp_path):
    """A mid-write partial YAML whose completing write lands in the
    same coarse timestamp AND byte length must not serve the old (or
    no) config forever: failed loads are NOT stat-recorded, so every
    poll retries them (r9 review). Size is pinned too — a differing
    st_size would let the (mtime_ns, size) change detector pass the
    test even with the retry fix reverted."""
    p = os.path.join(str(tmp_path), "user.yml")
    write_yaml(str(tmp_path), "user.yml")  # measure the good size
    good_size = os.stat(p).st_size
    broken = ("dbMapping: [broken" + " " * good_size)[:good_size]
    with open(p, "w", encoding="utf-8") as f:
        f.write(broken)
    mon = ConfigMonitor(str(tmp_path))
    mon.poll()
    assert "user.yml" not in mon.configs
    st = os.stat(p)
    write_yaml(str(tmp_path), "user.yml")
    # completed write pinned to the broken one's EXACT (mtime_ns, size)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert os.stat(p).st_size == st.st_size == good_size
    mon.poll()
    assert "user.yml" in mon.configs


def test_changed_config_is_never_absent_between_polls(tmp_path):
    """A change publishes ONE state: the mapping must be resolvable
    from routing at every point — _remove-then-_add left a window
    where dispatch silently skipped the table (r9 fix-review)."""
    write_yaml(str(tmp_path), "user.yml", target="M.T")
    mon = ConfigMonitor(str(tmp_path))
    mon.poll()

    observed_absent = []
    orig_add = mon._add

    def spying_add(name, cfg):
        # called mid-change in the old two-swap protocol: the config
        # would be missing HERE; with _replace, _add is never invoked
        # for a change at all
        if not mon.configs_for("example_mytest-user"):
            observed_absent.append(name)
        orig_add(name, cfg)

    mon._add = spying_add
    write_yaml(str(tmp_path), "user.yml", target="M.T2")
    bump_mtime(os.path.join(str(tmp_path), "user.yml"))
    mon.poll()
    assert not observed_absent
    assert mon.configs["user.yml"].db_mapping.target_table == "M.T2"


def test_failed_marker_gc_for_vanished_files(tmp_path):
    """A failing-from-birth file that disappears must not leak its
    _failed marker (it is in neither _mtimes nor configs, so the
    delete loop never sees it; r9 fix-review)."""
    p = os.path.join(str(tmp_path), "bad.yml")
    with open(p, "w", encoding="utf-8") as f:
        f.write("dbMapping: [broken")
    mon = ConfigMonitor(str(tmp_path))
    mon.poll()
    assert "bad.yml" in mon._failed
    os.remove(p)
    mon.poll()
    assert "bad.yml" not in mon._failed


def test_delete_during_failed_load_retry_drops_last_good_config(tmp_path):
    """good -> broken (old config kept, retried) -> file deleted: the
    served config must be dropped even though the retry loop holds no
    mtime entry for the file (r9 review)."""
    p = write_yaml(str(tmp_path), "user.yml")
    mon = ConfigMonitor(str(tmp_path))
    mon.poll()
    assert "user.yml" in mon.configs
    with open(p, "w", encoding="utf-8") as f:
        f.write("dbMapping: [broken")
    mon.poll()
    assert "user.yml" in mon.configs  # last good config still served
    os.remove(p)
    ev = mon.poll()
    assert ev["deleted"] == ["user.yml"]
    assert "user.yml" not in mon.configs
    assert not mon.configs_for("example_mytest-user")


def test_reload_swaps_snapshots_instead_of_mutating(tmp_path):
    """Copy-on-write reload: a reader holding the dict from before a
    poll must see a STABLE snapshot (the driver's foreachBatch iterates
    configs while the poll thread applies events — in-place mutation
    raises 'dictionary changed size during iteration')."""
    write_yaml(str(tmp_path), "a.yml", target="M.A")
    mon = ConfigMonitor(str(tmp_path))
    mon.poll()
    before_configs = mon.configs
    before_routing = mon.configs_for("example_mytest-user")
    write_yaml(str(tmp_path), "b.yml", target="M.B")
    bump_mtime(os.path.join(str(tmp_path), "b.yml"))
    mon.poll()
    # old snapshots untouched; new state visible through the monitor
    assert set(before_configs) == {"a.yml"}
    assert set(before_routing) == {"a.yml"}
    assert set(mon.configs) == {"a.yml", "b.yml"}
