"""Column-expression builders: the engine's scalar function layer.

Everything here returns pyspark Column expressions (JVM-side,
whole-stage-codegen friendly) — never Python UDFs. That keeps the
scalar layer on the Catalyst fast path at any scale.
"""

from canal_phoenix_adapter_spark.functions.coerce import (  # noqa: F401
    boolean_lenient,
    coerce_to,
    coerce_to_schema,
    zero_date_lenient,
)
from canal_phoenix_adapter_spark.functions.enums import enum_decode  # noqa: F401
from canal_phoenix_adapter_spark.functions.hashing import (  # noqa: F401
    md5_long,
    minhash_value,
)
