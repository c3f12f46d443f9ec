"""Multimodal column plumbing: opaque binary payloads + typed
metadata, with decode / feature-extraction as Arrow-batched Pandas
functions over mapInPandas (SURVEY §7.4).

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (deterministic fake features / NotImplementedError
for real codecs). Everything Spark-side is real and tested: schemas,
binary columns, batch iteration, partition-preserving mapInPandas.

Scale shape: payloads never pass through Python row-at-a-time — Arrow
moves whole batches; metadata-only operations (routing, filtering,
size stats) are pure Column expressions that never touch the bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from canal_phoenix_adapter_spark.functions.hashing import md5_long

MEDIA_TYPES = ["image", "audio", "video"]

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, first_byte int, "
    "byte_sum_mod bigint"
)


def as_media_table(docs: DataFrame) -> DataFrame:
    """Derive a media table from documents.parquet: payload = utf-8
    bytes of the text (a deterministic opaque blob), media_type cycled
    by doc_id, plus typed metadata columns."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
            F.col("n_chars").cast("long").alias("orig_bytes"),
        ).alias("meta"),
    )


def payload_stats(media: DataFrame) -> DataFrame:
    """Metadata-only path: byte sizes per media_type without ever
    shipping payloads to Python (pure Column expressions)."""
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.min(F.length("payload")).alias("min_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
    )


def extract_features(media: DataFrame, batch_hint: int = 64) -> DataFrame:
    """Arrow-batched feature extraction over the binary payloads.

    The stub features (n_bytes, first_byte, byte_sum_mod) stand in for
    a real decoder; the mapInPandas plumbing — schema contract, batch
    iteration, no driver collect — is the real, scale-relevant part.
    """

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            out = pdf[["doc_id", "media_type"]].copy()
            payloads = pdf["payload"]
            # NULL payloads yield NULL features (len(None) would raise
            # a TypeError in the executor and kill the job); pandas
            # nullable Int dtypes carry the None through Arrow.
            out["n_bytes"] = payloads.map(
                lambda b: len(b) if b is not None else None
            ).astype("Int64")
            out["first_byte"] = payloads.map(
                lambda b: None if b is None else (int(b[0]) if len(b) else -1)
            ).astype("Int32")
            out["byte_sum_mod"] = payloads.map(
                lambda b: sum(b) % 997 if b is not None else None
            ).astype("Int64")
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def decode_image(media: DataFrame, decoder=None) -> DataFrame:
    """Image decode with an INJECTED codec: ``decoder`` is a plain
    ``bytes -> list[float]`` callable (a deployment wraps PIL/libjpeg
    here; this container has none, so tests inject a deterministic
    fake). The Spark side is real either way: images routed by
    metadata before any byte moves, payloads crossing to Python only
    as Arrow batches inside mapInPandas, NULL payloads carried through
    as NULL vectors. Without a decoder it raises — a silent fake
    default could be mistaken for real pixels."""
    if decoder is None:
        raise NotImplementedError(
            "image decode needs a codec (not in container): pass "
            "decoder=bytes->list[float], or use extract_features() "
            "for codec-free payload features"
        )

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            out = pdf[["doc_id"]].copy()
            out["features"] = pdf["payload"].map(
                lambda b: None if b is None else [float(x) for x in decoder(b)]
            )
            yield out

    return media.where(F.col("media_type") == "image").mapInPandas(
        batches, schema="doc_id bigint, features array<float>"
    )


def frame_sample(
    media: DataFrame, every_n: int = 4, frame_bytes: int = 16
) -> DataFrame:
    """Video frame sampling: REAL plumbing, fake codec.

    A real pipeline seeks every n-th frame and decodes it; without
    codecs in this container, a "frame" is modeled as ``frame_bytes``
    consecutive payload bytes at its offset — which makes every
    scale-relevant part real: the per-video frame-index explode
    (sequence with step — no Python loop), the binary slicing of the
    payload (``substring`` on BinaryType, executor-side), and the
    per-frame signature (md5 of the slice's HEX — see the inline
    comment for why hex, not raw bytes). Swapping in a real
    decoder replaces ONLY the signature expression with an Arrow
    mapInPandas decode of the sliced bytes; the sampling topology —
    one generator per video, frames resolved without shuffling
    payloads — is exactly this.

    Output: (doc_id, frame_idx, byte_offset, frame_sig) for every
    every_n-th frame of each video payload."""
    vids = media.where(F.col("media_type") == "video")
    n_frames = F.floor(F.length("payload") / F.lit(frame_bytes))
    # A payload holding zero complete frames (shorter than one frame,
    # empty, or NULL) yields NO rows — a greatest(n_frames-1, 0)
    # sequence would fabricate a phantom frame_idx=0 whose signature
    # hashes a partial slice.
    vids = vids.where(n_frames >= 1)
    idx = F.explode(
        F.sequence(F.lit(0), (n_frames - 1).cast("int"), F.lit(every_n))
    )
    out = vids.select("doc_id", "payload", idx.alias("frame_idx"))
    offset = (F.col("frame_idx") * frame_bytes + 1).cast("int")
    frame = F.expr(f"substring(payload, frame_idx * {frame_bytes} + 1, {frame_bytes})")
    # md5 over the HEX of the slice, not the raw bytes: hex is pure
    # ASCII, so byte and codepoint semantics coincide and the DuckDB
    # oracle computes the identical digest for ANY payload (non-ASCII
    # text, arbitrary binary) — the r8 ASCII-only parity caveat, closed
    sig = md5_long(F.hex(frame))
    return out.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        offset.cast("long").alias("byte_offset"),
        sig.alias("frame_sig"),
    )


def thumbnail_plan(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Resize plumbing, codec-free: compute each image's thumbnail
    geometry (aspect-preserving integer fit into max_side x max_side —
    real arithmetic a production resize needs regardless of codec) and
    a deterministic stand-in for the thumbnail payload (md5 signature
    of the HEX of the first 32 payload bytes). A real implementation swaps the
    signature for an Arrow mapInPandas decode-resize-encode of the
    payload column; geometry, routing (images only), and the
    no-payload-shuffle shape stay exactly as planned here."""
    imgs = media.where(F.col("media_type") == "image")
    w = F.col("meta.width").cast("long")
    h = F.col("meta.height").cast("long")
    long_side = F.greatest(w, h)

    def fit(side):
        # floor-scaled integer fit, never upscale, floor >= 1
        scaled = F.greatest(
            F.floor(side * max_side / long_side).cast("long"), F.lit(1)
        )
        return F.when(long_side <= max_side, side).otherwise(scaled)

    # hex-of-slice digest for bytes-true oracle parity (see frame_sample)
    sig = md5_long(F.hex(F.expr("substring(payload, 1, 32)")))
    return imgs.select(
        "doc_id",
        w.alias("width"),
        h.alias("height"),
        fit(w).alias("thumb_w"),
        fit(h).alias("thumb_h"),
        sig.alias("thumb_sig"),
    )
