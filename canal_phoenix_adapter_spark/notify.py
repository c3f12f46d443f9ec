"""HTTP notify sink (S9): fire-and-forget POST when the target schema
changes.

The reference async-POSTs ``{"database": ..., "table": ...}`` JSON to
``notifyUrl`` after syncSchema applies DDL
(service/PhoenixEtlService.java:174-215, called at :162). Here the
side effect is an injectable callable so the schema-evolution path
stays pure and testable: ``make_notifier(cfg)`` returns a hook that
``run_cdc_stream``/``apply_cdc_epoch`` invoke with the payload on
schema-changing epochs; tests inject a recording hook instead.
"""

from __future__ import annotations

import json
import logging
import threading
from collections.abc import Callable

from canal_phoenix_adapter_spark.config import MappingConfig

logger = logging.getLogger(__name__)

NotifyHook = Callable[[dict], None]


def notify_payload(cfg: MappingConfig) -> dict:
    """The POST body (PhoenixEtlService.java:179-187): targetDb wins
    when set, else targetTable splits on the first dot."""
    m = cfg.db_mapping
    if m.target_db:
        return {"database": m.target_db, "table": m.target_table}
    db, _, tbl = m.target_table.partition(".")
    return {"database": db, "table": tbl or db}


def http_post_notify(url: str, payload: dict, timeout: float = 5.0) -> None:
    """One async JSON POST, errors logged and swallowed — the reference
    never fails a sync because a notify failed (:195-215 callbacks only
    log). stdlib urllib; no HTTP client dependency."""

    def _post() -> None:
        try:
            # Request construction INSIDE the try: a malformed
            # notifyUrl (schemeless YAML typo) raises in urllib and
            # must surface as the documented warning, not a silent
            # thread death (r9 review)
            import urllib.request

            req = urllib.request.Request(
                url,
                data=json.dumps(payload).encode("utf-8"),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
                logger.info("notify done => %s %s %s", url, payload, resp.status)
        except Exception as e:  # noqa: BLE001 - notify is best-effort
            logger.warning("notify failed => %s %s", url, e)

    try:
        threading.Thread(target=_post, daemon=True).start()
    except Exception as e:  # noqa: BLE001 - thread exhaustion on the
        # caller (foreachBatch driver) thread: best-effort means a
        # notify failure may never fail the sync that triggered it
        logger.warning("notify failed => %s %s", url, e)


def make_notifier(cfg: MappingConfig) -> NotifyHook | None:
    """The hook ``run_cdc_stream`` installs: None when no notifyUrl is
    configured (the reference's StringUtils.isEmpty early-return,
    :175)."""
    if not cfg.notify_url:
        return None
    url = cfg.notify_url

    def hook(payload: dict) -> None:
        http_post_notify(url, payload)

    return hook
