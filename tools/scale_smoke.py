"""Scale-sanity harness: multiply the sf0.1 tables N-fold (id-offset
copies, so dedup/LSH keys stay distinct) and measure how the heavy
operators scale. Near-linear wall growth => the plan has no hidden
quadratic; superlinear growth names the operator to fix.

Usage: python tools/scale_smoke.py [N ...]   (default: 1 4 8)

This is a diagnostic, not the bench: it synthesizes data in memory
(union of offset copies reading the same parquet N times) and prints
one JSON line per factor.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from canal_phoenix_adapter_spark.operators import dedup, sampling, similarity  # noqa: E402
from canal_phoenix_adapter_spark.operators import text as text_ops  # noqa: E402
from canal_phoenix_adapter_spark.operators.asof import asof_join  # noqa: E402
from canal_phoenix_adapter_spark.operators.merge import merge_cdc  # noqa: E402
from canal_phoenix_adapter_spark.session import get_spark  # noqa: E402
from canal_phoenix_adapter_spark.sources.events import synthetic_changes  # noqa: E402
from canal_phoenix_adapter_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def multiply(df, id_col: str, n: int, stride: int = 10_000_000):
    """n id-offset copies of df; every copy's keys are disjoint."""
    out = None
    for i in range(n):
        c = df.withColumn(id_col, F.col(id_col) + F.lit(i * stride))
        out = c if out is None else out.unionByName(c)
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    spark = get_spark("scale-smoke")
    docs0 = load_table(spark, SF_DIR, "documents")
    emb0 = load_table(spark, SF_DIR, "embeddings")
    events0 = load_table(spark, SF_DIR, "events")

    # Warm the JVM before any timed op (first-job codegen, parquet
    # footer reads, shuffle service spin-up): without this the first
    # factor's FIRST entry absorbs the whole cold start — r2's
    # committed artifact showed cdc_merge 5.18s at 1x vs 1.80s at 4x
    # purely because cdc_merge was the first job of the process.
    for t in (docs0, emb0, events0):
        t.write.format("noop").mode("overwrite").save()

    for n in factors:
        docs = multiply(docs0, "doc_id", n)
        emb = multiply(emb0, "vec_id", n)

        def events0_mult(k):
            return multiply(events0, "event_id", k)
        # events: offset the SEQ (event_id) but keep user_ids shared so
        # the per-key event density grows n-fold — the hard direction
        # for the keep-last window.
        changes = synthetic_changes(
            multiply(events0, "event_id", n), with_pk_change=False
        )
        ops = {
            "cdc_merge": lambda: merge_cdc(
                None, changes, ["user_id"], check_truncate=False
            ),
            "dedup_exact": lambda: dedup.exact_dedup(docs, "doc_id", "text"),
            "minhash_lsh_capped": lambda: dedup.minhash_lsh_candidates(
                docs, "doc_id", "text", num_perm=16, bands=4, n=4, max_bucket=50
            ),
            "simhash_pairs_capped": lambda: dedup.simhash_hamming_pairs(
                docs, "doc_id", "text", max_dist=3, bands=4, max_bucket=200
            ),
            # Fixed planes: collision RATE is constant, so candidates
            # (and wall) grow ~quadratically with corpus size — visible
            # here, and the reason the next entry exists.
            "embedding_lsh_fixed16": lambda: dedup.embedding_near_dup_pairs_lsh(
                emb, threshold=0.4, num_planes=16, bands=4, dim=64, max_bucket=2000
            ),
            # The scaling discipline: planes grow with log2(corpus)
            # (+2 bits per 4x data per band here), holding expected
            # bucket SIZE (hence sum-of-squared-bucket-sizes) roughly
            # constant — wall should grow ~linearly.
            "embedding_lsh_scaled_planes": lambda: dedup.embedding_near_dup_pairs_lsh(
                emb, threshold=0.4,
                num_planes=16 + 4 * max(0, (n.bit_length() - 1)),
                bands=4, dim=64, max_bucket=2000,
            ),
            "ann_ivf": lambda: similarity.ann_topk_ivf(emb),
            "vocab_topk": lambda: sampling.vocab_topk(docs, "text", k=20),
            "ngram_jaccard_maxdf": lambda: dedup.ngram_jaccard_pairs(
                docs, "doc_id", "text", n=4, threshold=0.5, max_df=5
            ),
            # Linear by construction (no pair enumeration) — should
            # track corpus size ~1:1.
            "chunk_crossdoc": lambda: dedup.chunk_crossdoc_stats(
                docs, "doc_id", "text", size=8
            ),
            "boilerplate_strip": lambda: text_ops.boilerplate_strip(
                docs, "doc_id", "text", size=8, max_df=2 * n
            ),
            # As-of join: per-key event density grows n-fold (user_ids
            # shared across copies) — the window sort is the stressed
            # path, cost should stay ~n log n, never quadratic.
            "asof_join": lambda: asof_join(
                events0_mult(n).where(F.col("event_type") == "purchase").select(
                    F.col("event_id").alias("pe"), "user_id",
                    F.col("ts_us").alias("p_ts"),
                ),
                events0_mult(n).where(F.col("event_type") == "click").groupBy(
                    "user_id", F.col("ts_us").alias("c_ts")
                ).agg(F.max("event_id").alias("ce")),
                on=["user_id"], left_ts="p_ts", right_ts="c_ts",
            ),
        }
        times = {}
        # default 3, min-of-N: a single pass folds each plan shape's
        # Janino/C2 compile (constant per factor) into its only sample,
        # deflating the growth ratios this tool exists to measure
        passes = int(os.environ.get("SPARK_GRAFT_SMOKE_PASSES", "3"))
        for name, build in ops.items():
            best = float("inf")
            for _ in range(passes):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 2)
        print(json.dumps({"factor": n, "times": times}), flush=True)


if __name__ == "__main__":
    main()
