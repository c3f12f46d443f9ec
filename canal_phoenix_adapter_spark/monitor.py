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
        self._mtimes: dict[str, float] = {}
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- cache mutation (java :137-163) --------------------------------
    def _add(self, name: str, cfg: MappingConfig) -> None:
        self.configs[name] = cfg
        self.routing.setdefault(cfg.routing_key(), {})[name] = cfg

    def _remove(self, name: str) -> None:
        self.configs.pop(name, None)
        for configs in self.routing.values():
            configs.pop(name, None)

    def _accepts(self, cfg: MappingConfig) -> bool:
        """Key filter (java :75-76): both None, or equal."""
        return (self.outer_adapter_key or None) == (cfg.outer_adapter_key or None)

    # -- the poll ------------------------------------------------------
    def poll(self) -> dict[str, list[str]]:
        """One observer pass: diff dir state against the last poll and
        apply create/change/delete. Returns the event lists (for tests
        and logging)."""
        seen: dict[str, float] = {}
        try:
            for name in sorted(os.listdir(self.conf_dir)):
                if not name.endswith((".yml", ".yaml")):
                    continue
                try:
                    seen[name] = os.path.getmtime(os.path.join(self.conf_dir, name))
                except OSError:  # deleted between listdir and stat
                    continue
        except FileNotFoundError:
            seen = {}

        events: dict[str, list[str]] = {"created": [], "changed": [], "deleted": []}
        for name in self._mtimes.keys() - seen.keys():
            self._remove(name)
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
                logger.error("config %s load failed: %s", name, e)
                continue
            if kind == "changed" and name in self.configs:
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
                self._remove(name)
            self._add(name, cfg)
            events[kind].append(name)
            logger.info("%s phoenix mapping config: %s", kind, name)
        self._mtimes = seen
        return events

    def configs_for(self, routing_key: str) -> dict[str, MappingConfig]:
        """The dispatch lookup (PhoenixSyncService.java:163-168)."""
        return self.routing.get(routing_key.lower(), {})

    # -- background mode (init/destroy, java :34-58) -------------------
    def start(self, interval_sec: float = POLL_INTERVAL_SEC) -> None:
        if self._thread is not None:
            return
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
            self._thread = None
