"""Capped vs uncapped agreement for the skew-guarded pair joins.

The invariant that makes cap-by-default safe to ship: a bucket cap
only ever REMOVES candidate pairs, and every removed pair lost ALL of
its shared buckets to the cap (i.e. the pair's every common shingle /
band bucket was over the size limit). No pair connected through any
surviving bucket is dropped, and no new pair can appear.

(For n-gram Jaccard this holds at the candidate level, threshold=0;
with a positive threshold the capped variant recomputes sizes over
kept shingles, so scores — and hence threshold survivors — legally
differ. The gate queries document that.)
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from canal_phoenix_adapter_spark.functions.hashing import md5_long
from canal_phoenix_adapter_spark.operators import dedup

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]
BOILER = "subscribe to our newsletter terms of service apply"


@pytest.fixture(scope="module")
def corpus(spark):
    """~36 docs: every doc carries the same boilerplate sentence (hot
    buckets under any cap), plus seeded word soup; five exact near-dup
    pairs that also share rare content."""
    rng = random.Random(42)
    rows = []
    for i in range(26):
        body = " ".join(rng.choice(WORDS) for _ in range(12))
        rows.append((i, f"{BOILER} {body}"))
    for j in range(5):  # near-dups: shared rare tail
        base = " ".join(rng.choice(WORDS) for _ in range(10))
        rows.append((100 + 2 * j, f"{BOILER} {base} rareword{j} one"))
        rows.append((101 + 2 * j, f"{BOILER} {base} rareword{j} two"))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def _check_dropped_pairs_only_hot(shared_bucket_df, dropped, cap):
    """Every dropped pair's shared buckets must ALL be over the cap.

    shared_bucket_df: (id_a, id_b, bucket_size) one row per shared
    bucket per candidate pair."""
    by_pair: dict[tuple, list[int]] = {}
    for r in shared_bucket_df.collect():
        by_pair.setdefault((r["id_a"], r["id_b"]), []).append(r["sz"])
    for p in dropped:
        sizes = by_pair.get(p, [])
        assert sizes, f"dropped pair {p} shares no bucket at all?"
        assert all(s > cap for s in sizes), (
            f"pair {p} dropped despite a surviving shared bucket "
            f"(sizes {sizes}, cap {cap})"
        )


def test_ngram_jaccard_cap_subset_and_dropped_hot(spark, corpus):
    cap = 12
    uncapped = _pairs(
        dedup.ngram_jaccard_pairs(
            corpus, "doc_id", "text", n=3, threshold=0.0, max_df=None
        )
    )
    capped = _pairs(
        dedup.ngram_jaccard_pairs(
            corpus, "doc_id", "text", n=3, threshold=0.0, max_df=cap
        )
    )
    assert capped <= uncapped
    dropped = uncapped - capped
    assert dropped, "corpus failed to produce any over-cap shingle"

    sh = (
        dedup.raw_shingles(corpus, "doc_id", "text", 3)
        .select(F.col("doc_id").alias("id"), md5_long(F.col("shingle")).alias("sh"))
        .dropDuplicates(["id", "sh"])
    )  # no persist: ~36-doc corpus, and session-scoped cached blocks leak
    df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("sz"))
    shared = (
        sh.alias("a")
        .join(sh.alias("b"), on="sh")
        .where(F.col("a.id") < F.col("b.id"))
        .join(df_counts, on="sh")
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "sz"
        )
    )
    _check_dropped_pairs_only_hot(shared, dropped, cap)


@pytest.mark.parametrize("sig_width", [32, 64])
def test_simhash_cap_subset_and_dropped_hot(spark, corpus, sig_width):
    cap = 10
    # clone block: cap+2 IDENTICAL docs share every band value at ANY
    # sketch width, guaranteeing an over-cap bucket even for 16-bit
    # bands (the shared-boilerplate corpus alone saturates 8-bit band
    # values but not 16-bit ones — that selectivity gap is exactly why
    # simhash64 exists; without clones the 64-bit arm was vacuous)
    clones = spark.createDataFrame(
        [(200 + i, f"{BOILER} clone block identical payload")
         for i in range(cap + 2)],
        "doc_id bigint, text string",
    )
    corpus = corpus.unionByName(clones)
    kw = dict(max_dist=3, bands=4, width=sig_width)
    uncapped = _pairs(
        dedup.simhash_hamming_pairs(
            corpus, "doc_id", "text", max_bucket=None, **kw
        ).select("id_a", "id_b")
    )
    capped = _pairs(
        dedup.simhash_hamming_pairs(
            corpus, "doc_id", "text", max_bucket=cap, **kw
        ).select("id_a", "id_b")
    )
    assert capped <= uncapped
    dropped = uncapped - capped

    sk = dedup._simhash(corpus, "doc_id", "text", sig_width).select(
        F.col("doc_id").alias("id"), F.col("simhash").alias("sig")
    )
    width = sig_width // 4
    banded = sk.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sig", b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bv"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bv")  # no persist (tiny corpus; leak)
    sizes = banded.groupBy("band", "bv").agg(F.count(F.lit(1)).alias("sz"))
    shared = (
        banded.alias("x")
        .join(banded.alias("y"), on=["band", "bv"])
        .where(F.col("x.id") < F.col("y.id"))
        .join(sizes, on=["band", "bv"])
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"), "sz")
    )
    assert dropped, "corpus failed to produce any over-cap simhash band bucket"
    _check_dropped_pairs_only_hot(shared, dropped, cap)


def test_minhash_lsh_cap_subset_and_dropped_hot(spark, corpus):
    cap = 8
    kw = dict(num_perm=8, bands=4, n=3)
    uncapped = _pairs(
        dedup.minhash_lsh_candidates(
            corpus, "doc_id", "text", max_bucket=None, **kw
        )
    )
    capped = _pairs(
        dedup.minhash_lsh_candidates(
            corpus, "doc_id", "text", max_bucket=cap, **kw
        )
    )
    assert capped <= uncapped
    dropped = uncapped - capped

    buckets = dedup.minhash_band_buckets(corpus, "doc_id", "text", **kw)
    sizes = buckets.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("sz"))
    shared = (
        buckets.alias("x")
        .join(buckets.alias("y"), on=["band", "bh"])
        .where(F.col("x.id") < F.col("y.id"))
        .join(sizes, on=["band", "bh"])
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"), "sz")
    )
    assert dropped, "corpus failed to produce any over-cap minhash band bucket"
    _check_dropped_pairs_only_hot(shared, dropped, cap)
