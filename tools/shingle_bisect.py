"""Two-worktree A/B bench for the shingle/chunk-hash query family
(r5 verdict task 2): the four queries sharing that pipeline read a
systematic ~13-18% above their r3 plateau across two de-noised
rounds. This tool removes every cross-session variable the per-round
bench cannot: ONE Spark session (same JVM, same conf — session.py is
byte-identical between the trees), strictly INTERLEAVED samples
(A,B,A,B per round so host drift hits both arms equally), and the
same harness code timing both arms.

Usage:
  python tools/shingle_bisect.py [R3_TREE] [HEAD_TREE] [N_ROUNDS]
defaults: /tmp/r3tree /root/repo 7

Each tree's package is imported once under its own sys.path root and
its module set snapshotted; before every sample the owning tree's
modules are re-installed into sys.modules so lazy imports inside
query bodies resolve within the right tree. Prints one JSON line:
{"queries": {name: {"r3": {...}, "head": {...}, "delta_pct": x}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

QUERIES = [
    "dedup_ngram_jaccard_maxdf",
    "dedup_minhash_lsh_capped",
    "dedup_chunk_crossdoc",
    "text_boilerplate_strip",
]

_PREFIXES = ("canal_phoenix_adapter_spark", "__spark_entry__", "tests")


def _purge() -> None:
    for k in list(sys.modules):
        if k.split(".")[0] in ("__spark_entry__", "tests") or k.startswith(
            "canal_phoenix_adapter_spark"
        ):
            del sys.modules[k]


def _load_tree(root: str):
    """Import the tree's __spark_entry__ under its own path root and
    snapshot the module set it pulled in."""
    _purge()
    sys.path.insert(0, root)
    try:
        import __spark_entry__ as E  # noqa: PLC0415

        qs = E.queries()
        mods = {
            k: v
            for k, v in sys.modules.items()
            if k.split(".")[0] in ("__spark_entry__", "tests")
            or k.startswith("canal_phoenix_adapter_spark")
        }
    finally:
        sys.path.remove(root)
    return qs, mods


def _activate(mods) -> None:
    _purge()
    sys.modules.update(mods)


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
        trees[name] = ({q: qs[q] for q in QUERIES}, mods)

    # session.py is identical in both trees; use head's factory
    _activate(trees["head"][1])
    from canal_phoenix_adapter_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark("shingle-bisect")

    def run_once(name: str, qname: str) -> float:
        qs, mods = trees[name]
        _activate(mods)
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
            "median": round(sorted(s)[len(s) // 2], 3),
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
    print(json.dumps({"sf_dir": sf_dir, "rounds": n_rounds, "queries": out}))


if __name__ == "__main__":
    main()
