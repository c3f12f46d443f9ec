"""Config hot reload (S10): watch a mapping-config directory and keep
the routing registry current without restarting the driver.

The reference polls its conf dir every 3 s with a commons-io
FileAlterationMonitor and mutates the adapter's two caches on
create/change/delete (monitor/PhoenixConfigMonitor.java:35-163).
Same semantics here, poll-based on mtime:

  * create  -> load + validate + add to both caches (:63-83)
  * change  -> reload; an outerAdapterKey change is rejected
               ("Outer adapter key not allowed modify", :104-117)
  * delete  -> drop from both caches (:121-133)
  * a file that fails to load/validate is logged and skipped — the
    reference never lets one bad YAML take down the adapter (:79-82)

`poll()` is synchronous and deterministic (tests drive it directly);
`start()` runs it on a daemon thread at the reference's 3 s cadence.
The registry is config state on the DRIVER — executors never see it;
a changed config simply shapes the next micro-batch's plan.
"""

from __future__ import annotations

import logging
import os
import threading

from canal_phoenix_adapter_spark.config import MappingConfig, load_config

logger = logging.getLogger(__name__)

POLL_INTERVAL_SEC = 3.0  # FileAlterationMonitor(3000, ...) (:44)


class ConfigMonitor:
    """Poll-based mirror of PhoenixConfigMonitor: filename -> config
    plus the routing cache routing_key -> {filename: config}
    (PhoenixAdapter.getMappingConfigCache shape)."""

    def __init__(self, conf_dir: str, outer_adapter_key: str | None = None):
        self.conf_dir = conf_dir
        self.outer_adapter_key = outer_adapter_key
        self.configs: dict[str, MappingConfig] = {}
        self.routing: dict[str, dict[str, MappingConfig]] = {}
        self._mtimes: dict[str, tuple[int, int]] = {}
        self._failed: dict[str, tuple[int, int]] = {}
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- cache mutation (java :137-163) --------------------------------
    # Copy-on-write: the poll thread swaps whole dicts instead of
    # mutating in place, so a foreachBatch driver thread iterating
    # configs/routing mid-reload sees a stable snapshot rather than
    # "dictionary changed size during iteration" (r9 review). Config
    # counts are small; the copies are trivial next to the 3 s cadence.
    def _add(self, name: str, cfg: MappingConfig) -> None:
        configs = dict(self.configs)
        configs[name] = cfg
        routing = {k: dict(v) for k, v in self.routing.items()}
        routing.setdefault(cfg.routing_key(), {})[name] = cfg
        self.configs, self.routing = configs, routing

    def _remove(self, name: str) -> None:
        configs = dict(self.configs)
        configs.pop(name, None)
        routing = {
            k: {n: c for n, c in v.items() if n != name}
            for k, v in self.routing.items()
        }
        self.configs, self.routing = configs, routing

    def _replace(self, name: str, cfg: MappingConfig) -> None:
        """Change = ONE published state, not _remove-then-_add: two
        swaps leave a window where the mapping is absent from routing
        and a concurrent dispatch silently skips its rows. (configs
        and routing are two attribute stores, but no reader consults
        both together: route_all reads configs, configs_for reads
        routing.)"""
        configs = dict(self.configs)
        configs[name] = cfg
        routing = {
            k: {n: c for n, c in v.items() if n != name}
            for k, v in self.routing.items()
        }
        routing.setdefault(cfg.routing_key(), {})[name] = cfg
        self.configs, self.routing = configs, routing

    def _accepts(self, cfg: MappingConfig) -> bool:
        """Key filter (java :75-76): both None, or equal."""
        return (self.outer_adapter_key or None) == (cfg.outer_adapter_key or None)

    # -- the poll ------------------------------------------------------
    def poll(self) -> dict[str, list[str]]:
        """One observer pass: diff dir state against the last poll and
        apply create/change/delete. Returns the event lists (for tests
        and logging)."""
        seen: dict[str, tuple[int, int]] = {}
        try:
            for name in sorted(os.listdir(self.conf_dir)):
                if not name.endswith((".yml", ".yaml")):
                    continue
                try:
                    st = os.stat(os.path.join(self.conf_dir, name))
                    # (mtime_ns, size): plain float mtime misses a
                    # rewrite landing in the same coarse-granularity
                    # timestamp as the already-polled version
                    seen[name] = (st.st_mtime_ns, st.st_size)
                except OSError:  # deleted between listdir and stat
                    continue
        except FileNotFoundError:
            seen = {}

        events: dict[str, list[str]] = {"created": [], "changed": [], "deleted": []}
        load_failures: list[str] = []
        # union with live config names: a file in failed-load retry has
        # no _mtimes entry, but its LAST GOOD config is still served and
        # must still be dropped when the file disappears
        for name in (self._mtimes.keys() | self.configs.keys()) - seen.keys():
            self._remove(name)
            self._failed.pop(name, None)
            events["deleted"].append(name)
            logger.info("Delete a phoenix mapping config: %s", name)
        for name, mtime in seen.items():
            prior = self._mtimes.get(name)
            if prior is not None and prior == mtime:
                continue
            kind = "created" if prior is None else "changed"
            try:
                cfg = load_config(os.path.join(self.conf_dir, name))
            except Exception as e:  # noqa: BLE001 - bad YAML must not kill the loop
                # do NOT record the mtime: a failed load is retried on
                # every poll (a mid-write partial YAML whose completing
                # write lands in the same coarse timestamp would
                # otherwise serve the OLD config forever). Log once per
                # distinct file state, not once per 3 s poll.
                if self._failed.get(name) != mtime:
                    logger.error("config %s load failed: %s", name, e)
                    self._failed[name] = mtime
                load_failures.append(name)
                continue
            self._failed.pop(name, None)
            # keyed on LIVE config presence, not event kind: a file
            # recovering from a failed-load retry arrives as "created"
            # yet still replaces a served config, so the key-change
            # rejection must apply to it too
            if name in self.configs:
                old = self.configs[name]
                if (old.outer_adapter_key or None) != (cfg.outer_adapter_key or None):
                    # java :110-112: the key routes to an adapter
                    # instance; changing it in place is rejected
                    logger.error(
                        "Outer adapter key not allowed modify: %s", name
                    )
                    continue
            if not self._accepts(cfg):
                continue
            if name in self.configs:
                self._replace(name, cfg)
            else:
                self._add(name, cfg)
            events[kind].append(name)
            logger.info("%s phoenix mapping config: %s", kind, name)
        for name in load_failures:
            seen.pop(name, None)
        # GC failure markers for vanished files (a failing-from-birth
        # file is in neither _mtimes nor configs, so the delete loop
        # above never sees it; without this the marker leaks and can
        # wrongly suppress the error log for a same-stat reappearance)
        for name in self._failed.keys() - seen.keys() - set(load_failures):
            self._failed.pop(name, None)
        self._mtimes = seen
        return events

    def configs_for(self, routing_key: str) -> dict[str, MappingConfig]:
        """The dispatch lookup (PhoenixSyncService.java:163-168)."""
        return self.routing.get(routing_key.lower(), {})

    # -- background mode (init/destroy, java :34-58) -------------------
    def start(self, interval_sec: float = POLL_INTERVAL_SEC) -> None:
        if self._thread is not None:
            if self._thread.is_alive():
                # running, or a stop() that timed out on a hung poll:
                # clearing _stop now would resurrect the OLD loop and
                # race a new poller over the same caches (r9 review).
                # Loud when it is the stopped-but-hung case — the old
                # loop exits as soon as its hung syscall returns, so
                # "start() succeeded" would silently mean NO poller.
                if self._stop.is_set():
                    logger.error(
                        "start() refused: previous poll thread still "
                        "shutting down; call start() again once it exits"
                    )
                return
            self._thread = None
        # a stop()ed monitor must be restartable: without the clear, a
        # second start() would launch a thread whose wait() returns
        # immediately and dies after zero polls while looking started.
        self._stop.clear()
        self.poll()  # initial load

        def run() -> None:
            while not self._stop.wait(interval_sec):
                try:
                    self.poll()
                except Exception as e:  # noqa: BLE001 - keep polling
                    logger.error("config poll failed: %s", e)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=POLL_INTERVAL_SEC * 2)
            if self._thread.is_alive():
                # hung poll (e.g. stat on a dead mount): keep the handle
                # so start() cannot launch a second poller beside it
                logger.error("config poll thread did not stop in time")
                return
            self._thread = None
