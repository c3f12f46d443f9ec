"""Deterministic, engine-portable hashing primitives.

Used by dedup/similarity operators (MinHash, SimHash, fingerprints).
Built on md5 rather than Spark's murmur3 ``hash()`` so that the DuckDB
correctness oracle can compute bit-identical values: both engines
expose md5 as lowercase hex, and a 15-hex-digit prefix fits in a
signed 64-bit integer (60 bits).

MinHash permutations run in the field mod p = 2^31-1 so every
intermediate ((h mod p) * a + b) stays below 2^62: no int64 overflow,
which matters because Spark 4 ANSI mode *raises* on overflow instead
of wrapping, and DuckDB int64 arithmetic must agree bit-for-bit.

All pure Column expressions — no UDFs, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MINHASH_PRIME = 2147483647  # Mersenne prime 2^31 - 1


def bq(name: str) -> str:
    """Backtick-quote an identifier for generated Spark SQL text.

    Shared by every operator that builds its expression tree as SQL
    text instead of composed Column objects (merge kernel, sketch
    constructions): a width-N sketch composed Column-by-Column costs
    O(N) py4j round-trips PER CALL — profiled at 1.5-1.9 s of driver
    wall for simhash at width 32 (r14) — where the text form is a
    handful of calls with identical analyzed plans."""
    return "`" + name.replace("`", "``") + "`"


def md5_long(col: Column) -> Column:
    """First 60 bits of md5(col) as a non-negative bigint.

    DuckDB equivalent: CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)
    """
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def _perm_params(i: int) -> tuple[int, int]:
    """Deterministic per-permutation (a, b), 1 <= a < p, 0 <= b < p."""
    a = (2654435761 * (2 * i + 1)) % MINHASH_PRIME
    b = (40503 * (i * i + i + 17)) % MINHASH_PRIME
    return (a or 1), b


def minhash_value(hash_col: Column, perm: int) -> Column:
    """One MinHash permutation applied to a pre-hashed shingle value:
    ((h mod p) * a + b) mod p. Identical formula runs in the DuckDB
    oracle (minhash_perm_params exposes the constants)."""
    a, b = _perm_params(perm)
    return ((hash_col % MINHASH_PRIME) * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)


def minhash_perm_params(num_perm: int) -> list[tuple[int, int]]:
    """Expose the (a,b) table so oracle SQL can be generated with the
    same constants."""
    return [_perm_params(i) for i in range(num_perm)]
