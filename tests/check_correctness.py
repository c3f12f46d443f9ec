"""Local replica of the driver's t2 correctness gate: run every
queries() entry and its oracle_sql() on the same parquet tables,
compare row-count + schema + order-insensitive values.

Usage: python tests/check_correctness.py [--parity] [sf_dir] [name ...]

``--parity`` additionally includes the folded-gate registry
(tests/parity_registry.py) — the queries verified by pytest's
test_oracle_parity.py rather than the driver artifact since round 4.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    import datetime
    import decimal
    import math

    # NaN folds to None DELIBERATELY: the pandas boundary has already
    # destroyed the NULL/NaN distinction for float64 columns on BOTH
    # sides (toPandas and duckdb .df() render SQL NULL as NaN), so a
    # distinct NaN sentinel here cannot catch an engine-NaN-vs-oracle-
    # NULL regression — it can only false-FAIL genuinely-equal NULLs
    # whose dtypes differ across the two frames (object None on one
    # side, float64 NaN on the other). NaN-regression defense lives in
    # the operators' guards and their unit tests instead.
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float) and math.isinf(v):
        return "inf" if v > 0 else "-inf"
    if isinstance(v, decimal.Decimal):
        return f"{v:.6f}"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "item"):
        v = v.item()
        return norm_cell(v) if not isinstance(v, (int, str, bool, bytes)) else v
    return v


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--parity"]
    include_parity = len(argv) != len(sys.argv) - 1
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as E
    from canal_phoenix_adapter_spark.session import get_spark

    spark = get_spark("correctness-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    if include_parity:
        from tests.parity_registry import PARITY_ORACLE, PARITY_QUERIES

        qs = {**qs, **PARITY_QUERIES}
        oracles = {**oracles, **PARITY_ORACLE}
    if only:
        unknown = only - set(qs)
        if unknown:
            # a typo'd filter must not skip everything and report green
            print(f"FAIL  unknown query name(s): {sorted(unknown)}")
            return 1
    is_gate_sf = os.path.normpath(sf_dir).endswith("sf0.01")
    failures = []
    weak = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        # operators persist() intermediates; a long-lived driver
        # running many queries must clear between them (the cache
        # contract dedup.py documents; bench.py does the same)
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pd = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(spark_pd)} (no oracle) [{time.time()-t0:.1f}s]")
            weak.append(name)
            continue
        if name == "sim_ann_ivf_trained" and not is_gate_sf:
            # the trained-IVF oracle embeds centroids replica-trained
            # on sf0.01 (the driver's gate SF, entry.py); at any other
            # SF the engine trains on that SF's data and a compare
            # would be a guaranteed false FAIL
            print(f"weak  {name}: rows={len(spark_pd)} (oracle is sf0.01-"
                  f"specific; rows-only at {sf_dir}) [{time.time()-t0:.1f}s]")
            weak.append(name)
            continue
        try:
            duck_pd = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if len(spark_pd) != len(duck_pd):
            problems.append(f"rows {len(spark_pd)} != {len(duck_pd)}")
        if sorted(spark_pd.columns) != sorted(duck_pd.columns):
            problems.append(f"cols {sorted(spark_pd.columns)} != {sorted(duck_pd.columns)}")
        if not problems:
            a, b = canon(spark_pd), canon(duck_pd)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: rows={len(spark_pd)} [{time.time()-t0:.1f}s]")

    # weak = ran but only rows-counted (no oracle compare) — report it
    # so a green summary cannot hide value-unverified queries
    w = f", {len(weak)} weak (rows-only)" if weak else ""
    print(f"\n{n_run - len(failures)}/{n_run} ok{w} ({len(qs)} registered)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
