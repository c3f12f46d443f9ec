"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE compact JSON line as its
FINAL stdout line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: min_sec, ...}, "sf": ...}

The per-query sample distributions {min, median, max, n} go to the
BENCH_SAMPLES.json sidecar next to this file instead of stdout: the
driver captures only a bounded tail of stdout, and r6's inline
samples dict pushed the one line past that capture, clipping 11 of
36 queries from the round's canonical perf artifact (BENCH_r06.json
"parsed": null). The compact line must stay under that capture —
tests/test_bench_contract.py pins the budget at worst-case float
widths for every HEADLINE name (the full registry would NOT fit:
growing HEADLINE must keep that test green).

Each query is executed with a count()-style action so the full plan
runs but no result set is shipped to the driver (collect would
measure pandas conversion, not the engine).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the flagship CDC path + heaviest extension operators.
# Round-4 registry fold: retired variants swapped for their surviving
# twins (dedup_exact -> dedup_exact_groups, sampling_hash_split ->
# sampling_assembly, mm_frame_sample -> mm_geometry, token/fingerprint/
# repetition -> text_features, TPC-H showcase -> the registered
# analytics gates) so every benched name stays driver-gated; plus the
# streaming per-epoch drive (cdc_stream_20_epochs) the kernel bench
# cannot see.
HEADLINE = [
    "cdc_merge_full", "cdc_merge_into_state", "etl_scan_condition",
    "etl_idempotent_load", "proj_type_coercion", "dedup_exact_groups",
    "dedup_minhash_lsh_capped", "dedup_ngram_jaccard_maxdf",
    "dedup_simhash_pairs_capped", "dedup_embedding_cosine_lsh",
    "text_quality", "text_features", "text_vocab_topk",
    "sampling_assembly", "sampling_pack_sequences", "mm_geometry",
    "mm_extract_features", "analytics_asof_join",
    "analytics_asof_tiebreak", "dedup_chunk_crossdoc",
    "text_boilerplate_strip", "text_pii_scrub", "dedup_semantic_ivf",
    "analytics_time_rollup", "analytics_topk_per_group",
    "analytics_rollup", "analytics_session_window",
    "analytics_salted_join", "pipeline_corpus_clean",
    # Iterative / incremental / train-serve paths: kept in the headline
    # so regressions in loops (Pregel components, Lloyd's k-means) and
    # batch-vs-index joins are visible round over round.
    "dedup_clusters", "text_decontaminate_ngram",
    "dedup_minhash_lsh_incremental", "sim_knn_join_ivf",
    "sim_ann_ivf_trained",
    # LAST, and timed in their own tail loop after every normal pass:
    # 20 streaming epochs leave shuffle/GC/checkpoint state behind
    # that polluted whichever queries followed it in r4's interleaved
    # order (the suspected cause of the +19-22% dedup readings on
    # unchanged code — VERDICT r4 task 2). The base row keeps the
    # r4-comparable full-snapshot store; the _pruned row watches the
    # O(touched-bucket) store's per-epoch machinery (at bench scale —
    # tiny state, every bucket touched — it measures that machinery's
    # OVERHEAD; its win is the state-scaling octave in
    # SCALE_SMOKE.json/tools/epoch_smoke.py, not this number).
    "cdc_stream_20_epochs",
    "cdc_stream_20_epochs_pruned",
]


def _run_cdc_stream_epochs(spark, sf_dir: str, n_epochs: int = 20,
                           rows_per_epoch: int = 100,
                           state_buckets: int | None = None) -> None:
    """Streaming-path workload: a fixed 20-epoch availableNow drive
    (one source file per micro-batch) through run_cdc_stream into the
    versioned parquet state store. What this measures — and the
    cdc_merge_full kernel bench cannot — is the PER-EPOCH machinery:
    foreachBatch dispatch, state-store basis read, snapshot commit +
    pointer swap, and the replay-watermark bookkeeping
    (streaming/stream.py apply_cdc_epoch). Keys overlap across epochs
    so merges do real upsert work; fresh state/checkpoint dirs per
    run, same synthetic source (sf-independent by design: epoch count,
    not data volume, dominates this cost)."""
    import json
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from canal_phoenix_adapter_spark.config import config_from_dict
    from canal_phoenix_adapter_spark.streaming.stream import (
        ParquetStateStore,
        PrunedParquetStateStore,
        run_cdc_stream,
    )

    cfg = config_from_dict(
        {
            "destination": "bench",
            "dbMapping": {
                "database": "mytest",
                "table": "user",
                "targetTable": "mytest2.user",
                "targetPk": {"id": "id"},
            },
        }
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("balance", T.DoubleType()),
        ]
    )
    base = tempfile.mkdtemp(prefix="cpa_bench_stream_")
    try:
        src = os.path.join(base, "src")
        os.makedirs(src)
        for e in range(n_epochs):
            rows = [
                {
                    "id": str((e * 37 + i * 13) % (rows_per_epoch * 4)),
                    "name": f"u{e}_{i}",
                    "balance": str((i * 31 + e) % 997),
                }
                for i in range(rows_per_epoch)
            ]
            env = {
                "destination": "bench",
                "database": "mytest",
                "table": "user",
                "type": "INSERT" if e % 3 else "UPDATE",
                "isDdl": False,
                "es": 1700000000 + e,
                "ts": 1700000000000 + e,
                "data": rows,
                "old": None,
            }
            with open(os.path.join(src, f"b{e:03d}.json"), "w",
                      encoding="utf-8") as f:
                f.write(json.dumps(env) + "\n")
        q = run_cdc_stream(
            spark, src, os.path.join(base, "state"),
            os.path.join(base, "ckpt"), cfg, schema,
            max_files_per_trigger=1, state_buckets=state_buckets,
        )
        if not q.awaitTermination(600):  # timed out: sample is garbage
            q.stop()  # stop BEFORE the rmtree pulls dirs from under it
            raise RuntimeError("streaming drive exceeded 600s")
        if state_buckets:
            store = PrunedParquetStateStore(
                spark, os.path.join(base, "state"), ["id"], state_buckets
            )
        else:
            store = ParquetStateStore(spark, os.path.join(base, "state"))
        state = store.read()
        assert state is not None and state.count() > 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


# Workloads that drive their own execution (streaming epochs) instead
# of returning a DataFrame for the noop sink.
SPECIAL = {
    "cdc_stream_20_epochs": _run_cdc_stream_epochs,
    "cdc_stream_20_epochs_pruned": (
        lambda spark, sf_dir: _run_cdc_stream_epochs(
            spark, sf_dir, state_buckets=32
        )
    ),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as E
    from canal_phoenix_adapter_spark.session import get_spark

    spark = get_spark("bench")
    qs = E.queries()
    # Folded gates (tests/parity_registry.py) stay benchable for
    # round-over-round continuity even though the driver artifact no
    # longer records them; resolve HEADLINE against the gate registry
    # first, then the parity registry.
    try:
        from tests.parity_registry import PARITY_QUERIES

        qs = {**PARITY_QUERIES, **qs}
    except Exception as e:  # noqa: BLE001 - bench must run without tests/
        print(f"WARNING bench: parity registry unavailable: {e!r}",
              file=sys.stderr)
    missing = [n for n in HEADLINE if n not in qs and n not in SPECIAL]
    if missing:
        # a silently shrinking headline reads as a phantom speedup in
        # round-over-round BENCH comparisons — flag it loudly
        print(f"WARNING bench: HEADLINE names not registered: {missing}",
              file=sys.stderr)
    names = [n for n in HEADLINE if n in qs or n in SPECIAL] or list(qs)
    # Diagnostic subset (comma-separated names): isolates queries from
    # the 50-query session's composition effects (SCALE.md r6 bisect).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        names = [n for n in names if n in keep]

    def run_query(name: str) -> None:
        if name in SPECIAL:
            SPECIAL[name](spark, sf_dir)
        else:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Warm the JVM at the TARGET scale factor: AQE picks different
    # physical shapes at different sizes, so warming at a tiny SF
    # leaves the real plans' generated classes uncompiled and the
    # first timed run pays multi-second Janino+C2 costs. Caches are
    # cleared before each timed run, so only code compilation state
    # carries over — the timed pass recomputes all data (steady-state
    # engine throughput, the number that scales to a real cluster).
    # SPECIAL (streaming) drives are NOT warmed here: their session
    # pollution (+19-22%, r4) must stay after the timed normal passes,
    # so their warmup sits just before their own timed tail.
    normal = [n for n in names if n not in SPECIAL]
    specials = [n for n in names if n in SPECIAL]
    for name in normal:
        try:
            run_query(name)
        except Exception:  # noqa: BLE001 - warmup is best-effort
            pass

    # Timed passes (default 3), report the min per query: the host occasionally
    # steals CPU for multiple seconds (observed 40s craters on a 1.6s
    # query with zero guest-side processes running), and min-of-N is
    # the standard estimator for true cost under asymmetric noise.
    # Caches are cleared before every pass, so each pass recomputes the
    # full pipeline from the parquet scans.
    def run_once(name: str) -> float:
        # Drop datasets persisted by earlier queries (operators persist
        # intermediates reused within one query; across queries stale
        # blocks only add GC/eviction pressure).
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        run_query(name)
        return round(time.perf_counter() - t0, 3)

    # Normal queries run all their passes BEFORE any SPECIAL workload:
    # the 20-epoch streaming drive leaves session state (shuffle files,
    # GC pressure, checkpoint churn) that r4 measured as +19-22% on
    # the queries that followed it in interleaved order.
    # Every sample is kept (r5 task 4): the headline `queries` value
    # stays min-of-N (the robust estimator under asymmetric host-steal
    # noise), but the per-query {min, median, max, n} distribution is
    # emitted alongside so round-over-round adjudication can tell a
    # plateau shift from a one-off crater without re-running the bench.
    samples: dict[str, list[float]] = {n: [] for n in names}
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    for _pass in range(n_passes):
        for name in normal:
            samples[name].append(run_once(name))

    # Queries under a few seconds are the noisiest in RELATIVE terms
    # (a multi-hundred-ms host steal reads as a double-digit-percent
    # regression — r4 flagged +19-22% on byte-identical code in the
    # 1-3 s band), and extra samples of them are cheap by
    # construction — so give the fast tail extra min-samples.
    # Default raised 2 -> 4 in r15 (min-of-7 for the fast tail, ~60s
    # extra per full run): the r14 driver run reported 12 phantom
    # >10% "regressions" on completely untouched 0.2-3s queries —
    # all inside the documented host-steal band — and more min
    # samples is the only additive fix (r14 VERDICT task 7). The
    # timed methodology is unchanged: same queries, same noop sink,
    # same min-of-N estimator, cache cleared before every pass.
    fast_cut = float(os.environ.get("SPARK_GRAFT_BENCH_FAST_CUTOFF", "3.0"))
    for _pass in range(int(os.environ.get("SPARK_GRAFT_BENCH_FAST_EXTRA", "4"))):
        for name in normal:
            if not samples[name] or min(samples[name]) >= fast_cut:
                continue
            samples[name].append(run_once(name))

    for name in specials:  # tail-scoped warmup (see warmup note above)
        try:
            run_query(name)
        except Exception:  # noqa: BLE001 - warmup is best-effort
            pass
    for _pass in range(n_passes):
        for name in specials:
            samples[name].append(run_once(name))

    times = {n: min(s) for n, s in samples.items() if s}
    dist = {
        n: {
            "min": min(s),
            "median": round(statistics.median(s), 3),
            "max": max(s),
            "n": len(s),
        }
        for n, s in samples.items() if s
    }
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: object = float(sf)
    except ValueError:
        sf_val = sf
    line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": round(sum(times.values()), 3),
            "unit": "sec",
            "queries": times,
            "sf": sf_val,
        },
        separators=(",", ":"),
    )
    if len(line) > 1800:  # driver tail capture is ~2000 chars
        print(f"WARNING bench: final line {len(line)} chars may exceed "
              "the driver's stdout tail capture", file=sys.stderr)
    # Line first (the driver-parsed artifact), sidecar second: a crash
    # between the two loses only the sidecar update. Diagnostic runs
    # (SPARK_GRAFT_BENCH_ONLY subsets) skip the sidecar so they never
    # clobber the committed full-registry distributions.
    print(line, flush=True)
    sidecar = os.environ.get("SPARK_GRAFT_BENCH_SAMPLES")
    if sidecar or not only:
        sidecar = sidecar or os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_SAMPLES.json"
        )
        with open(sidecar + ".tmp", "w", encoding="utf-8") as f:
            json.dump({"samples": dist, "sf": sf_val, "passes": n_passes}, f)
        os.replace(sidecar + ".tmp", sidecar)  # atomic: crash keeps the old one


if __name__ == "__main__":
    main()
