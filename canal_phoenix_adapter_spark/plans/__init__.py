"""Physical-plan inspection helpers (scale hygiene checks)."""

from canal_phoenix_adapter_spark.plans.explain import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
)
