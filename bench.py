"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is executed with a count()-style action so the full plan
runs but no result set is shipped to the driver (collect would
measure pandas conversion, not the engine).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the flagship CDC path + heaviest extension operators.
HEADLINE = [
    "cdc_merge_full",
    "cdc_merge_into_state",
    "etl_scan_condition",
    "etl_idempotent_load",
    "proj_type_coercion",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_capped",
    "dedup_ngram_jaccard_maxdf",
    "dedup_simhash_pairs_capped",
    "dedup_embedding_cosine_lsh",
    "sim_topk_cosine",
    "sim_ann_ivf",
    "text_quality",
    "text_vocab_topk",
    "sampling_hash_split",
    "sampling_pack_sequences",
    "mm_frame_sample",
    "analytics_asof_join",
    "dedup_chunk_crossdoc",
    "text_boilerplate_strip",
    "text_pii_scrub",
    "dedup_semantic_ivf",
    "analytics_q1_pricing",
    "analytics_q5_join",
    "analytics_q17_small_qty",
    "analytics_q10_returns",
    "analytics_q19_disjunctive",
    "analytics_q7_volume",
    "analytics_session_window",
    "analytics_salted_join",
    "pipeline_corpus_clean",
    # Iterative / incremental / train-serve paths: kept in the headline
    # so regressions in loops (Pregel components, Lloyd's k-means) and
    # batch-vs-index joins are visible round over round.
    "dedup_clusters",
    "text_decontaminate_ngram",
    "dedup_minhash_lsh_incremental",
    "sim_knn_join_ivf",
    "sim_ann_ivf_trained",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as E
    from canal_phoenix_adapter_spark.session import get_spark

    spark = get_spark("bench")
    qs = E.queries()
    missing = [n for n in HEADLINE if n not in qs]
    if missing:
        # a silently shrinking headline reads as a phantom speedup in
        # round-over-round BENCH comparisons — flag it loudly
        print(f"WARNING bench: HEADLINE names not registered: {missing}",
              file=sys.stderr)
    names = [n for n in HEADLINE if n in qs] or list(qs)

    # Warm the JVM at the TARGET scale factor: AQE picks different
    # physical shapes at different sizes, so warming at a tiny SF
    # leaves the real plans' generated classes uncompiled and the
    # first timed run pays multi-second Janino+C2 costs. Caches are
    # cleared before each timed run, so only code compilation state
    # carries over — the timed pass recomputes all data (steady-state
    # engine throughput, the number that scales to a real cluster).
    for name in names:
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001 - warmup is best-effort
            pass

    # Timed passes (default 3), report the min per query: the host occasionally
    # steals CPU for multiple seconds (observed 40s craters on a 1.6s
    # query with zero guest-side processes running), and min-of-N is
    # the standard estimator for true cost under asymmetric noise.
    # Caches are cleared before every pass, so each pass recomputes the
    # full pipeline from the parquet scans.
    times: dict[str, float] = {}
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    for _pass in range(n_passes):
        for name in names:
            # Drop datasets persisted by earlier queries (operators
            # persist intermediates reused within one query; across
            # queries stale blocks only add GC/eviction pressure).
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 3)
            times[name] = min(times.get(name, elapsed), elapsed)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: object = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
