"""Two-worktree A/B bench for the shingle/chunk-hash query family
(r5 verdict task 2, resolved as code-parity — SCALE.md r6). Removes
every cross-session variable the per-round bench cannot: ONE Spark
session, strictly interleaved samples (A,B,A,B per round so host
drift hits both arms equally), the same harness timing both arms.

Usage: python tests/shingle_bisect.py [R3_TREE] [HEAD_TREE] [N_ROUNDS]
(defaults /tmp/r3tree /root/repo 7). Prints one JSON line:
{"queries": {name: {"r3": {...}, "head": {...}, "delta_pct": x}}},
where "r3" is the FIRST tree argument and "head" the second, plus
the applicationId of the shared session. SPARK_GRAFT_BISECT_QUERIES
(comma-separated) overrides the default shingle family — any
registered query name works; that is how non-shingle movers get the
same one-session adjudication (r9: dedup_minhash_lsh_capped +
analytics_time_rollup).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

QUERIES = [
    q.strip()
    for q in os.environ.get(
        "SPARK_GRAFT_BISECT_QUERIES",
        "dedup_ngram_jaccard_maxdf,dedup_minhash_lsh_capped,"
        "dedup_chunk_crossdoc,text_boilerplate_strip",
    ).split(",")
    if q.strip()
]

def _is_tree_module(name: str) -> bool:
    return name.split(".")[0] in ("__spark_entry__", "tests") or name.startswith(
        "canal_phoenix_adapter_spark"
    )


def _purge() -> None:
    for k in list(sys.modules):
        if _is_tree_module(k):
            del sys.modules[k]


_ROOTS: list[str] = []  # both tree roots, for _activate's path swap


def _load_tree(root: str):
    """Import the tree's __spark_entry__ under its own path root and
    snapshot the module set it pulled in."""
    _purge()
    _ROOTS.append(root)
    sys.path.insert(0, root)
    try:
        import __spark_entry__ as E  # noqa: PLC0415

        qs = E.queries()
        mods = {k: v for k, v in sys.modules.items() if _is_tree_module(k)}
    finally:
        sys.path.remove(root)
    return qs, mods


def _activate(mods, root: str) -> None:
    """Install the tree's snapshotted modules AND its path root — a
    lazy first import inside a timed query body must resolve within
    the OWNING tree, not whichever tree loaded last (or the cwd)."""
    _purge()
    sys.modules.update(mods)
    sys.path[:] = [p for p in sys.path if p not in _ROOTS]
    sys.path.insert(0, root)


def main() -> None:
    r3_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3tree"
    head_root = sys.argv[2] if len(sys.argv) > 2 else "/root/repo"
    n_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    trees = {}
    for name, root in (("r3", r3_root), ("head", head_root)):
        qs, mods = _load_tree(root)
        missing = [q for q in QUERIES if q not in qs]
        if missing:
            raise SystemExit(f"{name} tree at {root} lacks {missing}")
        trees[name] = ({q: qs[q] for q in QUERIES}, mods, root)

    # session.py is identical in both trees; use head's factory
    _activate(trees["head"][1], trees["head"][2])
    from canal_phoenix_adapter_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark("shingle-bisect")

    def run_once(name: str, qname: str) -> float:
        qs, mods, root = trees[name]
        _activate(mods, root)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[qname](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    for name in trees:  # JVM/codegen warmup, untimed
        for q in QUERIES:
            run_once(name, q)

    samples: dict[str, dict[str, list[float]]] = {
        q: {n: [] for n in trees} for q in QUERIES
    }
    for _ in range(n_rounds):
        for name in trees:
            for q in QUERIES:
                samples[q][name].append(run_once(name, q))

    def stats(s: list[float]) -> dict:
        return {
            "min": min(s),
            "median": round(statistics.median(s), 3),
            "max": max(s),
            "n": len(s),
        }

    out = {}
    for q in QUERIES:
        a, b = stats(samples[q]["r3"]), stats(samples[q]["head"])
        out[q] = {
            "r3": a,
            "head": b,
            "delta_pct": round(100 * (b["min"] - a["min"]) / a["min"], 1),
            "raw": samples[q],
        }
    print(json.dumps({"sf_dir": sf_dir, "rounds": n_rounds,
                      "trees": {"r3": r3_root, "head": head_root},
                      "session": spark.sparkContext.applicationId,
                      "queries": out}))


if __name__ == "__main__":
    main()
