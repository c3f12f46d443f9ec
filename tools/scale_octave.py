"""One measured scale octave for the BATCH surface (r9 verdict #2):
synthesize a 10x sf0.1 input ("sf1-equivalent": 6M lineitem / 50k
documents / 20k embeddings / 1M events) and run a query set at both
scales, strictly interleaved in ONE stamped session, min-of-N per
cell. Defaults to the TOP8 cost set (the r10 run); select any driver/
parity/octave-only queries with SPARK_GRAFT_OCTAVE_QUERIES and tag
the output row with SPARK_GRAFT_OCTAVE_TAG (r11 ran R11_SET). Output:
one JSON line appended to SCALE_SMOKE.json with wall mins, wall
ratio, and output-row counts at both scales (rows context separates
data-growth effects from engine scaling).

Copies are made semantically DISTINCT, not replicated: document
tokens get a per-copy suffix EXCEPT stopwords and language markers
(shingle/minhash spaces stay disjoint across copies so the near-dup
profile scales linearly instead of exploding quadratically on exact
clones, while quality/langid profiles are preserved — suffixing
stopwords zeroed every copy's stopword_ratio in synthesis v1 and the
corpus-clean pipeline filtered all copies out); embeddings get a
deterministic hash-style isotropic jitter (v1 used same-frequency
sinusoids, which confined every jitter vector to a 2-D subspace and
manufactured 365x more near-dup pairs — retired, see SCALE.md);
lineitem/part key domains are offset per copy (per-key join fan-out
constant).

Usage: python tools/scale_octave.py [src_sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTOR = 10
# per-copy id offset; clears the gates' witness-shard ranges. A CHAINED
# octave must widen it past the previous decade's id span (copy k of
# copy j would otherwise collide with copy j+k): the r11 second-decade
# run used 100_000_000.
OFF = int(os.environ.get("SPARK_GRAFT_OCTAVE_OFF", "10000000"))
TOP8 = [
    "dedup_embedding_cosine_lsh", "dedup_ngram_jaccard_maxdf",
    "sim_ann_ivf_trained", "dedup_clusters", "pipeline_corpus_clean",
    "dedup_simhash_pairs_capped", "analytics_salted_join",
    "dedup_minhash_lsh_capped",
]
# r10 verdict task 2: the families the r10 octave never measured, plus
# the two adjudication witnesses (simhash64 vs the measured simhash32
# saturation; embedding LSH at a production threshold where output
# stays tiny). SPARK_GRAFT_OCTAVE_QUERIES overrides either set.
R11_SET = [
    "text_features", "text_boilerplate_strip", "text_decontaminate_ngram",
    "analytics_asof_join", "analytics_asof_tiebreak",
    "sampling_pack_sequences", "mm_extract_features", "cdc_merge_full",
    "dedup_simhash_pairs_capped", "dedup_simhash64_pairs",
    "dedup_embedding_cosine_lsh_t09",
]


def synthesize(src: str, out: str) -> None:
    from canal_phoenix_adapter_spark.operators.text import LANG_MARKERS, STOPWORDS

    # SPARK_GRAFT_OCTAVE_TABLES=documents,embeddings bounds a CHAINED
    # decade to the tables its query set reads (decade 3 would multiply
    # lineitem to 600M pandas rows nobody scans); the stamp records the
    # subset, so a filtered dir is never reused as a full one.
    only = {t for t in os.environ.get(
        "SPARK_GRAFT_OCTAVE_TABLES", "").split(",") if t}

    def want(t: str) -> bool:
        return not only or t in only

    keep = set(STOPWORDS) | {m for ms in LANG_MARKERS.values() for m in ms}
    os.makedirs(out, exist_ok=True)
    docs = pd.read_parquet(f"{src}/documents.parquet") if want("documents") else None
    parts = [docs] if docs is not None else []
    for k in range(1, FACTOR) if docs is not None else []:
        c = docs.copy()
        c["doc_id"] += k * OFF
        sfx = f"~{k}"
        c["text"] = c["text"].map(
            lambda t, s=sfx: None if t is None else " ".join(
                w if w.lower() in keep else w + s for w in t.split()
            )
        )
        c["n_chars"] = c["text"].map(lambda t: 0 if t is None else len(t))
        parts.append(c)
    if parts:
        pd.concat(parts, ignore_index=True).to_parquet(f"{out}/documents.parquet")

    emb = pd.read_parquet(f"{src}/embeddings.parquet") if want("embeddings") else None
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64) if emb is not None else None
    dim = vecs.shape[1] if emb is not None else 0
    eparts = [emb] if emb is not None else []
    for k in range(1, FACTOR) if emb is not None else []:
        ids = emb["vec_id"].to_numpy() + k * OFF
        # per-copy SIGNED PERMUTATION (an orthogonal transform): every
        # within-copy cosine is preserved exactly, so the near-dup pair
        # count scales exactly linearly (x FACTOR), while copies of the
        # SAME vector land in unrelated directions. (Both jitter
        # syntheses failed: additive noise small enough to preserve the
        # distribution leaves each vector's 10 copies a cos~0.99 clique
        # — 290x pair explosion, measured; see SCALE.md round 10.)
        rng = np.random.RandomState(k)
        perm = rng.permutation(dim)
        signs = rng.choice([-1.0, 1.0], size=dim)
        eparts.append(pd.DataFrame({
            "vec_id": ids,
            "embedding": list((vecs[:, perm] * signs).astype(np.float32)),
            "label": emb["label"].to_numpy(),
        }))
    if eparts:
        pd.concat(eparts, ignore_index=True).to_parquet(f"{out}/embeddings.parquet")

    # facts scale; dims that stay small at 100 TB (nation/region/
    # supplier) deliberately do NOT — the realistic shape. orderkey/
    # custkey offsets are shared across lineitem/orders/customer so
    # per-key join fan-out stays constant (r11: orders/customer added
    # for the multi-table TPC-H shapes).
    keys = {
        "lineitem": ["l_orderkey", "l_partkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
    }
    for tbl, cols in keys.items():
        if not want(tbl):
            continue
        t = pd.read_parquet(f"{src}/{tbl}.parquet")
        parts_t = [t]
        for k in range(1, FACTOR):
            c = t.copy()
            for col in cols:
                c[col] += k * OFF
            parts_t.append(c)
        pd.concat(parts_t, ignore_index=True).to_parquet(f"{out}/{tbl}.parquet")

    # bounded dims: present verbatim (queries join them; they stay 1x
    # at any corpus scale by definition — r11 parity-TPC-H batch)
    import shutil

    for tbl in ("region", "nation", "supplier"):
        if want(tbl):
            shutil.copyfile(f"{src}/{tbl}.parquet", f"{out}/{tbl}.parquet")

    # events: user_id/event_id domains offset per copy (per-key series
    # and CDC per-key change-chains replicate; ts kept, so the asof
    # time axis and keep-last ordering are preserved within each copy)
    if not want("events"):
        return
    ev = pd.read_parquet(f"{src}/events.parquet")
    eveparts = [ev]
    for k in range(1, FACTOR):
        c = ev.copy()
        c["event_id"] += k * OFF
        c["user_id"] += k * OFF
        eveparts.append(c)
    pd.concat(eveparts, ignore_index=True).to_parquet(f"{out}/events.parquet")


SYNTH_TAG = "v6-bounded-dims"  # bump on ANY synthesize() change


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # overridable so octaves CHAIN: src=/tmp/sf1-octave out=sf10-octave
    # measures the NEXT decade (r11: simhash64's second decade)
    out = os.environ.get("SPARK_GRAFT_OCTAVE_OUT", "/tmp/sf1-octave")
    marker = f"{out}/_synth"
    # The marker is written LAST and carries the synthesis version AND
    # the source dir: a partial run, a dir left by a retired synthesis,
    # OR a synth built from a DIFFERENT src (e.g. a smoke run at
    # sf0.001 — r11 review: the tag-only marker silently measured it
    # as sf1) is regenerated instead of silently measured. An
    # unreadable marker is just as stale (r10 fix-review).
    tables = os.environ.get("SPARK_GRAFT_OCTAVE_TABLES", "")
    stamp = f"{SYNTH_TAG}:{src}" + (f":{tables}" if tables else "")
    try:
        with open(marker) as f:
            stale = f.read() != stamp
    except OSError:
        stale = True
    if stale:
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        synthesize(src, out)
        with open(marker, "w") as f:
            f.write(stamp)
        print(f"synthesized {out} ({stamp}) in {time.time() - t0:.1f}s",
              flush=True)

    from canal_phoenix_adapter_spark import entry as E
    from canal_phoenix_adapter_spark.session import get_spark
    from tests.parity_registry import OCTAVE_QUERIES, PARITY_QUERIES, emb_count

    run_tag = os.environ.get("SPARK_GRAFT_OCTAVE_TAG", "batch-octave")
    names = [
        q.strip()
        for q in os.environ.get(
            "SPARK_GRAFT_OCTAVE_QUERIES", ",".join(TOP8)
        ).split(",")
        if q.strip()
    ]
    resolve = {**OCTAVE_QUERIES, **PARITY_QUERIES, **dict(E.QUERIES)}
    queries = {q: resolve[q] for q in names}

    spark = get_spark("scale-octave")
    if any(q.endswith(("_default", "_sized", "_serve")) for q in names):
        for d in (src, out):  # prewarm: keep the count out of timed cells
            emb_count(spark, d)
    if any(q.endswith("_serve") for q in names):
        from tests.parity_registry import sized_codebook

        for d in (src, out):  # prewarm: train once, untimed (see fn doc)
            sized_codebook(spark, d)
    cells: dict[str, dict] = {q: {"sf0.1": [], "sf1": [], "rows": {}} for q in names}
    for rep in range(reps):
        for q in names:
            for key, d in (("sf0.1", src), ("sf1", out)):
                spark.catalog.clearCache()
                t0 = time.time()
                n = queries[q](spark, d).count()
                cells[q][key].append(round(time.time() - t0, 3))
                cells[q]["rows"][key] = n
                print(f"rep{rep} {q} {key}: {cells[q][key][-1]}s rows={n}",
                      flush=True)
    row = {
        "run": run_tag,
        "app_id": spark.sparkContext.applicationId,
        "factor": FACTOR, "reps": reps,
        "queries": {
            q: {
                "sf0.1_min": min(c["sf0.1"]), "sf1_min": min(c["sf1"]),
                "wall_ratio": round(min(c["sf1"]) / min(c["sf0.1"]), 2),
                "rows": c["rows"],
            }
            for q, c in cells.items()
        },
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALE_SMOKE.json"), "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
