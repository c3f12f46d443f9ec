"""Parity registry: gate queries FOLDED OUT of the driver-facing
registry (canal_phoenix_adapter_spark/entry.py) in round 4 so that
the driver's 50-entry CORRECTNESS artifact witnesses every registered
query each round (r3 VERDICT #1).

Nothing here is retired functionality — every wrapper still calls the
same engine operator, and every oracle is still compared value-exact
against DuckDB, just by tests/test_oracle_parity.py (run on every
pytest pass, same method and SF as the driver's t2 gate) instead of
by the driver artifact. Each folded query's semantics are also still
driver-witnessed through its stronger surviving twin:

  dedup_exact              -> dedup_exact_groups (same digest kernel)
  dedup_minhash_signatures -> dedup_minhash_lsh_capped (sigs inside)
  dedup_minhash_lsh        -> dedup_minhash_lsh_capped (+ cap-
                              agreement property tests)
  dedup_keep_canonical     -> dedup_clusters (adds one anti join)
  dedup_simhash            -> dedup_simhash_pairs_capped
  dedup_embedding_cosine   -> dedup_embedding_cosine_lsh (bounded
                              all-pairs baseline stays as ground truth
                              in tests/test_cap_agreement.py)
  sim_topk_cosine / sim_ann_lsh / sim_ann_ivf
                           -> sim_ann_ivf_trained + sim_knn_join_ivf
  text_token_counts / text_repetition / text_fingerprint
                           -> text_features (all three joined)
  text_contamination       -> text_decontaminate_ngram
  text_adaptive_filter     -> pipeline_corpus_clean (same quality +
                              per-group-threshold composition)
  mm_payload_stats / mm_thumbnail -> mm_geometry (both joined)
  mm_frame_sample          -> mm_extract_features (same media table /
                              explode plumbing; parity-tested here)
  sampling_hash_split / sampling_group_quantiles
                           -> sampling_assembly (both joined)
  analytics TPC-H showcase (q1 q3 q4 q5 q6 q7 q10 q13 q14 q17 q18
  q19 q22, json_props, sessionize, event_funnel)
                           -> representative gates stay registered
                              (rollup, topk_per_group, time_rollup,
                              session_window, salted_join, asof);
                              the full suite is parity-tested here.

bench.py may also reference these names (round-over-round comparison
continuity); it resolves names against entry.QUERIES first, then this
registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_phoenix_adapter_spark.entry import (  # noqa: F401 - SQL fragments
    _DUP_SHARD_SQL,
    _H,
    _QUALITY_EXPR,
    _SPLIT_BUCKET,
    _minhash_lsh_sql,
    _minhash_sql,
    _pin_ws_class,
    _simhash_sql,
    _with_dup_shard,
)
from canal_phoenix_adapter_spark.operators import (
    analytics,
    dedup,
    multimodal,
    sampling,
    similarity,
    text as text_ops,
)
from canal_phoenix_adapter_spark.sources.tables import load_table

PARITY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
PARITY_ORACLE: dict[str, str] = {}


def register_parity(name: str, sql: str | None = None):
    def deco(fn):
        PARITY_QUERIES[name] = fn
        if sql is not None:
            # same whitespace-class dialect shim as the driver gates
            PARITY_ORACLE[name] = _pin_ws_class(sql)
        return fn
    return deco


@register_parity(
    "dedup_exact",
    f"""
    SELECT doc_id, content_sha FROM (
        SELECT doc_id, sha256(text) AS content_sha,
               row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        FROM {_DUP_SHARD_SQL}
    ) WHERE content_sha IS NULL OR rn = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical doc per sha256(text), over the synthetic
    duplicate shard (fixtures alone have zero duplicates — the keep-
    min rule would otherwise be unwitnessed)."""
    return dedup.exact_dedup(
        _with_dup_shard(load_table(spark, sf_dir, "documents")), "doc_id", "text"
    )
@register_parity("dedup_minhash_signatures", _minhash_sql(16))
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-permutation MinHash signature per document."""
    return dedup.minhash_signatures(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", num_perm=16, n=4
    )
@register_parity("dedup_minhash_lsh", _minhash_lsh_sql(16, 4))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: 16 perms, 4 bands x 4 rows."""
    return dedup.minhash_lsh_candidates(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        num_perm=16, bands=4, n=4, max_bucket=None,
    )
def _keep_canonical_sql(num_perm: int = 16, bands: int = 4) -> str:
    """Corpus minus non-representative cluster members: the recursive
    closure marks victims (cluster_id != id), the anti join keeps the
    rest."""
    return f"""
    WITH RECURSIVE pairs AS ({_minhash_lsh_sql(num_perm, bands)}),
    sym AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION
        SELECT id_b AS a, id_a AS b FROM pairs
    ),
    reach(n, m) AS (
        SELECT a, a FROM sym
        UNION
        SELECT r.n, s.b FROM reach r JOIN sym s ON s.a = r.m
    ),
    victims AS (
        SELECT n AS doc_id FROM reach GROUP BY n HAVING min(m) <> n
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM victims v WHERE v.doc_id = d.doc_id)
    """
@register_parity("dedup_keep_canonical", _keep_canonical_sql())
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dedup materialization: candidate pairs ->
    connected components -> drop every non-representative member
    (keep_canonical's broadcast anti join). What a training pipeline
    actually ships: the deduplicated corpus."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_candidates(
        docs, "doc_id", "text", num_perm=16, bands=4, n=4, max_bucket=None
    )
    clusters = dedup.dup_clusters(pairs)
    return dedup.keep_canonical(docs, clusters, "doc_id").select(
        "doc_id", "lang", "n_chars"
    )
@register_parity("dedup_simhash", _simhash_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash sketch per document."""
    return dedup.simhash32(load_table(spark, sf_dir, "documents"), "doc_id", "text")


def _simhash64_pairs_sql(max_dist: int = 3, bands: int = 4, max_bucket: int = 16) -> str:
    """64-bit twin of entry._simhash_pairs_sql: bits 0-59 from the _H
    md5 prefix, bits 60-63 from md5 hex digit 16; the sign bit (63) is
    assembled as -2^63 (a `* 2^63` term would overflow BIGINT)."""
    bit_sums = ",\n           ".join(
        "sum(CASE WHEN ({src} >> {sh}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}".format(
            src="h" if i < 60 else "hx", sh=i if i < 60 else i - 60, i=i
        )
        for i in range(64)
    )
    terms = [f"(CASE WHEN b{i} >= 0 THEN 1 ELSE 0 END) * {1 << i}" for i in range(63)]
    terms.append("(CASE WHEN b63 >= 0 THEN 1 ELSE 0 END) * (-9223372036854775808)")
    sketch = " + ".join(terms)
    bw = 64 // bands
    mask = (1 << bw) - 1
    band_rows = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id AS id, {b} AS band, (simhash >> {b * bw}) & {mask} AS bv FROM sig"
        for b in range(bands)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
    ),
    hs AS (SELECT doc_id, {_H.format(x='tok')} AS h,
                  CAST(nullif(concat('0x', substr(md5(tok),16,1)), '0x') AS BIGINT) AS hx
           FROM toks WHERE tok <> ''),
    bits AS (SELECT doc_id, {bit_sums} FROM hs GROUP BY doc_id),
    sig AS (SELECT doc_id, CAST({sketch} AS BIGINT) AS simhash FROM bits),
    banded AS (
        {band_rows}
    ),
    bsz AS (SELECT band, bv FROM banded GROUP BY band, bv HAVING count(1) <= {max_bucket}),
    capped AS (SELECT id, banded.band, banded.bv FROM banded JOIN bsz USING (band, bv)),
    cand AS (
        SELECT DISTINCT x.id AS id_a, y.id AS id_b
        FROM capped x JOIN capped y USING (band, bv)
        WHERE x.id < y.id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
    FROM cand
    JOIN sig sa ON id_a = sa.doc_id
    JOIN sig sb ON id_b = sb.doc_id
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {max_dist}
    """


@register_parity("dedup_simhash64_pairs", _simhash64_pairs_sql())
def dedup_simhash64_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup pairs (r10 verdict task 1): 16-bit
    bands keep producing candidates at corpus sizes where the 32-bit
    gate's byte bands saturate and pairs collapse (SCALE.md r10)."""
    return dedup.simhash_hamming_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        max_dist=3, bands=4, max_bucket=16, width=64,
    )
@register_parity(
    "dedup_embedding_cosine",
    """
    WITH v AS (
        SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings WHERE vec_id < 1000 AND list_dot_product(ve, ve) > 0
    )
    SELECT a.id AS id_a, b.id AS id_b
    FROM v a JOIN v b ON a.id < b.id
    WHERE list_dot_product(a.ve, b.ve)
          / (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve)))
          >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine >= 0.4 among vec_id < 1000."""
    return dedup.embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4, max_id=1000
    ).select("id_a", "id_b")
@register_parity(
    "sim_topk_cosine",
    """
    WITH v AS (
        SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings WHERE list_dot_product(ve, ve) > 0
    ),
    q AS (SELECT id AS query_id, ve AS qv FROM v WHERE id < 8),
    scored AS (
        SELECT query_id, v.id AS neighbor_id,
               list_dot_product(qv, ve)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(ve, ve))) AS cos
        FROM q JOIN v ON query_id <> v.id
    )
    SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for the first 8 query vectors."""
    return similarity.cosine_topk(
        load_table(spark, sf_dir, "embeddings"), num_queries=8, k=5
    )
def _ann_lsh_sql(num_planes: int = 8, dim: int = 64, num_queries: int = 8, k: int = 5) -> str:
    from canal_phoenix_adapter_spark.operators.similarity import plane_sign

    bucket_terms = []
    for p in range(num_planes):
        coeffs = ", ".join(str(float(plane_sign(p, d))) for d in range(dim))
        bucket_terms.append(
            f"(CASE WHEN list_dot_product(ve, [{coeffs}]) >= 0 THEN 1 ELSE 0 END) * {1 << p}"
        )
    bucket = " + ".join(bucket_terms)
    return f"""
    WITH v AS (
        SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings WHERE list_dot_product(ve, ve) > 0
    ),
    b AS (SELECT id, ve, CAST({bucket} AS BIGINT) AS bucket FROM v),
    q AS (SELECT id AS query_id, ve AS qv, bucket FROM b WHERE id < {num_queries}),
    scored AS (
        SELECT query_id, b.id AS neighbor_id,
               list_dot_product(qv, ve)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(ve, ve))) AS cos
        FROM q JOIN b USING (bucket) WHERE query_id <> b.id
    )
    SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """
@register_parity("sim_ann_lsh", _ann_lsh_sql())
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 within random-hyperplane LSH buckets (8 planes).
    dim=64 is testdata pipeline config (TESTDATA.md embeddings)."""
    return similarity.ann_topk_lsh(
        load_table(spark, sf_dir, "embeddings"), num_queries=8, k=5, num_planes=8,
        dim=64,
    )
@register_parity(
    "text_token_counts",
    f"""
    SELECT doc_id,
           len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS n_ws,
           len(regexp_extract_all(text, '{text_ops.BPE_TOKEN_RE}')) AS n_bpe
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counts."""
    df = load_table(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        text_ops.token_count_ws(F.col("text")).alias("n_ws"),
        text_ops.token_count_bpe(F.col("text")).alias("n_bpe"),
    )
@register_parity(
    "text_repetition",
    """
    WITH t AS (
        SELECT doc_id,
               list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                           l -> l <> '') AS lines,
               list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    f AS (
        SELECT doc_id,
               len(lines) AS n_lines,
               CASE WHEN lines IS NULL THEN NULL
                    WHEN len(lines) > 0
                    THEN 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
                    ELSE 0.0 END AS dup_line_frac,
               list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i+1]) AS bg
        FROM t
    ),
    c AS (
        SELECT doc_id, bigram, count(*) AS cnt
        FROM (SELECT doc_id, unnest(bg) AS bigram FROM f)
        GROUP BY doc_id, bigram
    ),
    m AS (
        SELECT doc_id, max(cnt) AS top_cnt FROM c GROUP BY doc_id
    )
    SELECT f.doc_id, f.n_lines, f.dup_line_frac,
           len(f.bg) AS n_bigrams,
           CASE WHEN f.bg IS NULL THEN NULL
                WHEN len(f.bg) > 0
                THEN CAST(m.top_cnt AS DOUBLE) / len(f.bg)
                ELSE 0.0 END AS top_bigram_frac
    FROM f LEFT JOIN m USING (doc_id)
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: dup-line fraction + top-bigram
    share (boilerplate/SEO-spam filter inputs)."""
    return text_ops.repetition_features(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )
@register_parity(
    "text_fingerprint",
    """
    SELECT doc_id,
           list_min(list_transform(range(1, greatest(length(text)-7, 1)+1),
                                   i -> md5(substr(text, CAST(i AS INT), 8)))) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-lite rolling-hash fingerprint (min md5 of 8-grams)."""
    df = load_table(spark, sf_dir, "documents")
    return df.select("doc_id", text_ops.fingerprint(F.col("text")).alias("fp"))
@register_parity(
    "mm_payload_stats",
    """
    SELECT (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS media_type,
           count(1) AS n,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           min(octet_length(encode(text))) AS min_bytes,
           max(octet_length(encode(text))) AS max_bytes
    FROM documents GROUP BY 1
    """,
)
def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata path: payload byte stats per media type."""
    media = multimodal.as_media_table(load_table(spark, sf_dir, "documents"))
    return multimodal.payload_stats(media)
@register_parity(
    "analytics_q1_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_base_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS VARCHAR) AS sum_disc_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DECIMAL(18,6)) AS VARCHAR) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(1) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(1) AS avg_price,
           count(1) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def analytics_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shape pricing summary (exact decimal sums)."""
    out = analytics.q1_pricing_summary(spark, sf_dir)
    return out.select(
        "l_returnflag", "l_linestatus",
        F.col("sum_qty").cast("decimal(18,2)").cast("string").alias("sum_qty"),
        F.col("sum_base_price").cast("decimal(18,2)").cast("string").alias("sum_base_price"),
        F.col("sum_disc_price").cast("decimal(18,4)").cast("string").alias("sum_disc_price"),
        F.col("sum_charge").cast("decimal(18,6)").cast("string").alias("sum_charge"),
        "avg_qty", "avg_price", "count_order",
    )
@register_parity(
    "analytics_q3_shipping",
    """
    SELECT l_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
           o_orderpriority,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS VARCHAR) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2000-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    """,
)
def analytics_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shape: revenue per order, broadcast dimension joins."""
    out = analytics.q3_shipping_priority(spark, sf_dir)
    return out.select(
        "l_orderkey",
        F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
        "o_orderpriority",
        F.col("revenue").cast("decimal(18,4)").cast("string").alias("revenue"),
    )
@register_parity(
    "analytics_q5_join",
    """
    SELECT n_name,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS VARCHAR) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def analytics_q5_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shape: 5-way broadcast join, revenue by nation."""
    out = analytics.q5_local_supplier_volume(spark, sf_dir)
    return out.select(
        "n_name",
        F.col("revenue").cast("decimal(18,4)").cast("string").alias("revenue"),
    )
@register_parity(
    "analytics_json_props",
    """
    WITH j AS (
        SELECT event_id,
               -- regex-guarded: DuckDB TRY_CAST is lenient ('12.5'->13)
               -- where Spark try_cast is NULL; guard pins Spark semantics
               CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')),
                                        '^[+-]?[0-9]+$')
                    THEN TRY_CAST(trim(json_extract_string(props, '$.k')) AS INT)
                    ELSE NULL END AS k
        FROM events
    )
    SELECT event_id, k, k % 10 AS k_bucket FROM j
    """,
)
def analytics_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction with typed coercion."""
    return analytics.json_props_extract(spark, sf_dir)
@register_parity(
    "analytics_sessionize",
    """
    WITH ev AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev_us
        FROM events
    ),
    marked AS (
        SELECT user_id, ts_us,
               CASE WHEN prev_us IS NULL OR ts_us - prev_us > 3600000000 THEN 1 ELSE 0 END AS sess_start
        FROM ev
    ),
    sess AS (
        SELECT user_id, ts_us,
               sum(sess_start) OVER (PARTITION BY user_id ORDER BY ts_us
                                     ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM marked
    ),
    per_sess AS (
        SELECT user_id, sess_id, count(1) AS n_events,
               min(ts_us) AS start_us, max(ts_us) AS end_us
        FROM sess GROUP BY user_id, sess_id
    )
    SELECT user_id, count(1) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           max(end_us - start_us) AS longest_session_us
    FROM per_sess GROUP BY user_id
    """,
)
def analytics_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (60 min) per user."""
    return analytics.sessionize_events(spark, sf_dir, gap_minutes=60)
@register_parity(
    "analytics_q4_semijoin",
    """
    SELECT o_orderpriority, count(1) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      AND o_orderdate < TIMESTAMP '1999-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > TIMESTAMP '1998-06-01')
    GROUP BY o_orderpriority
    """,
)
def analytics_q4_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shape EXISTS as a left_semi join."""
    return analytics.q4_priority_semijoin(spark, sf_dir)
@register_parity(
    "analytics_q22_antijoin",
    """
    SELECT c_nationkey, count(1) AS n_customers,
           CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS VARCHAR)
               AS sum_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    """,
)
def analytics_q22_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shape NOT EXISTS as a left_anti join (customers with
    no order since 2000-01-01 — a window chosen to be non-empty at
    every test SF)."""
    out = analytics.q22_no_orders_antijoin(spark, sf_dir)
    return out.select(
        "c_nationkey", "n_customers",
        F.col("sum_acctbal").cast("decimal(18,2)").cast("string").alias("sum_acctbal"),
    )
@register_parity(
    "analytics_q17_small_qty",
    """
    WITH pp AS (
        SELECT l_partkey AS pk,
               sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
               count(1) AS cnt
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS VARCHAR)
               AS small_qty_revenue,
           count(1) AS n_small
    FROM lineitem JOIN pp ON l_partkey = pp.pk
    WHERE CAST(5 AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * cnt < sum_qty
    GROUP BY l_partkey
    """,
)
def analytics_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shape correlated AVG, algebraized to exact decimal
    math (5*q*cnt < sum) so no double division crosses engines."""
    out = analytics.q17_small_quantity_revenue(spark, sf_dir)
    return out.select(
        "l_partkey",
        F.col("small_qty_revenue").cast("decimal(18,2)").cast("string")
        .alias("small_qty_revenue"),
        "n_small",
    )
@register_parity(
    "sampling_hash_split",
    f"""
    SELECT CASE WHEN {_SPLIT_BUCKET} < 8000 THEN 'train'
                WHEN {_SPLIT_BUCKET} < 9000 THEN 'val'
                ELSE 'test' END AS split,
           count(1) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM documents GROUP BY 1
    """,
)
def sampling_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split assignment by md5 bucket — same
    doc -> same split on any cluster, any partitioning, forever."""
    docs = load_table(spark, sf_dir, "documents")
    out = sampling.hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )
@register_parity(
    "sampling_group_quantiles",
    """
    WITH ranked AS (
        SELECT lang, n_chars,
               row_number() OVER (PARTITION BY lang ORDER BY n_chars ASC) AS rk,
               count(1) OVER (PARTITION BY lang) AS n
        FROM documents WHERE n_chars IS NOT NULL
    )
    SELECT lang,
           max(CASE WHEN rk = greatest(CAST(ceil(round(0.5 * n, 9)) AS BIGINT), 1) THEN n_chars END) AS q_50,
           max(CASE WHEN rk = greatest(CAST(ceil(round(0.9 * n, 9)) AS BIGINT), 1) THEN n_chars END) AS q_90
    FROM ranked GROUP BY lang
    """,
)
def sampling_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language EXACT discrete length quantiles (ceil-rank
    percentile_disc semantics — no interpolated doubles)."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.group_quantiles(docs, "lang", "n_chars", [0.5, 0.9],
                                    exact=True)
_PROBES = ["merge batch", "window spark", "key agg row", "zz-never-present"]
@register_parity(
    "text_contamination",
    f"""
    WITH probes AS (
        SELECT unnest([{", ".join(repr(p) for p in _PROBES)}]) AS probe
    )
    SELECT doc_id, count(1) AS n_probes_hit, min(probe) AS first_probe
    FROM documents JOIN probes ON contains(text, probe)
    GROUP BY doc_id
    """,
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: docs containing any probe string
    (broadcast probe set, streaming contains scan)."""
    docs = load_table(spark, sf_dir, "documents")
    probes = spark.createDataFrame([(p,) for p in _PROBES], "probe string")
    return sampling.contamination_hits(docs, probes)
@register_parity(
    "mm_frame_sample",
    f"""
    WITH vids AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               CAST(floor(octet_length(encode(text)) / 16.0) AS BIGINT) AS nf
        FROM documents WHERE doc_id % 3 = 2
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS frame_idx,
           CAST(i * 16 + 1 AS BIGINT) AS byte_offset,
           {_H.format(x="substr(hx, CAST(i * 32 + 1 AS BIGINT), 32)")} AS frame_sig
    FROM vids, unnest(range(0, nf, 4)) AS t(i)
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-frame sampling over video payloads: real explode +
    binary-slice plumbing, md5-of-hex frame signature standing in for
    the decoder (operators/multimodal.frame_sample). The oracle slices
    the payload's HEX — bytes-true for any corpus, ASCII or not."""
    media = multimodal.as_media_table(load_table(spark, sf_dir, "documents"))
    return multimodal.frame_sample(media, every_n=4, frame_bytes=16)
@register_parity(
    "mm_thumbnail",
    f"""
    SELECT doc_id,
           CAST(doc_id % 640 + 16 AS BIGINT) AS width,
           CAST(doc_id % 480 + 16 AS BIGINT) AS height,
           CASE WHEN greatest(doc_id % 640 + 16, doc_id % 480 + 16) <= 64
                THEN CAST(doc_id % 640 + 16 AS BIGINT)
                ELSE greatest(CAST(floor((doc_id % 640 + 16) * 64.0
                     / greatest(doc_id % 640 + 16, doc_id % 480 + 16)) AS BIGINT), 1)
           END AS thumb_w,
           CASE WHEN greatest(doc_id % 640 + 16, doc_id % 480 + 16) <= 64
                THEN CAST(doc_id % 480 + 16 AS BIGINT)
                ELSE greatest(CAST(floor((doc_id % 480 + 16) * 64.0
                     / greatest(doc_id % 640 + 16, doc_id % 480 + 16)) AS BIGINT), 1)
           END AS thumb_h,
           {_H.format(x="substr(hex(encode(text)), 1, 64)")} AS thumb_sig
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def mm_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving thumbnail geometry + payload-head signature
    for image rows (operators/multimodal.thumbnail_plan): the resize
    op's real integer arithmetic and routing, codec-free."""
    media = multimodal.as_media_table(load_table(spark, sf_dir, "documents"))
    return multimodal.thumbnail_plan(media, max_side=64)
def _adaptive_filter_sql() -> str:
    qual = _QUALITY_EXPR
    return f"""
    WITH t AS (
        SELECT doc_id, lang, text,
               list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks,
               list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS low
        FROM documents
    ),
    q AS (SELECT doc_id, lang, {qual} AS quality FROM t),
    ranked AS (
        SELECT lang, quality,
               row_number() OVER (PARTITION BY lang ORDER BY quality ASC) AS rk,
               count(1) OVER (PARTITION BY lang) AS n
        FROM q WHERE quality IS NOT NULL
    ),
    cut AS (
        SELECT lang,
               max(CASE WHEN rk = greatest(CAST(ceil(round(0.1 * n, 9)) AS BIGINT), 1)
                        THEN quality END) AS q_10
        FROM ranked GROUP BY lang
    )
    SELECT q.doc_id, q.lang FROM q JOIN cut USING (lang)
    WHERE q.quality >= cut.q_10
    """
@register_parity("text_adaptive_filter", _adaptive_filter_sql())
def text_adaptive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quality filtering: keep documents at or above their
    LANGUAGE's 10th-percentile quality — the composition a real
    pipeline runs (per-group thresholds, not one global magic number).
    quality_features -> exact per-lang quantile (ceil-rank) -> join +
    filter; the cutoff table is one row per language, broadcastable.
    Doubles compare safely because both engines build the identical
    quality expression (text_quality hash-matches bit-for-bit).

    The scored table q is PERSISTED (narrow: doc_id, lang, quality —
    never the text): it feeds BOTH the cut aggregation and the final
    filter, and without the persist the regex-tokenizing quality pass
    ran TWICE — measured as the DOMINANT decade-2 cost (r13: the
    unpersisted exact and approx variants both rode ~8-12x at 500k
    docs, within noise of each other, refuting r12's sort
    attribution; SCALE.md r13). Cache is caller-owned, _pair_join
    convention."""
    docs = load_table(spark, sf_dir, "documents")
    q = text_ops.quality_features(docs, "doc_id", "text").join(
        docs.select("doc_id", "lang"), on="doc_id"
    ).persist()
    cut = sampling.group_quantiles(q, "lang", "quality", [0.1], exact=True)
    return (
        q.join(F.broadcast(cut), on="lang")
        .where(F.col("quality") >= F.col("q_10"))
        .select("doc_id", "lang")
    )
def _ann_ivf_sql(num_queries: int = 8, k: int = 5) -> str:
    return f"""
    WITH v AS (
        SELECT vec_id AS id, embedding,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings WHERE list_dot_product(ve, ve) > 0
    ),
    cells AS (
        SELECT id, ve,
               CAST(list_position(list_transform(embedding, x -> abs(x)),
                                  list_max(list_transform(embedding, x -> abs(x)))) * 2
                    + CASE WHEN embedding[list_position(list_transform(embedding, x -> abs(x)),
                                                        list_max(list_transform(embedding, x -> abs(x))))] < 0
                           THEN 1 ELSE 0 END AS BIGINT) AS cell
        FROM v
    ),
    q AS (SELECT id AS query_id, ve AS qv, cell FROM cells WHERE id < {num_queries}),
    scored AS (
        SELECT query_id, c.id AS neighbor_id,
               list_dot_product(qv, ve)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(ve, ve))) AS cos
        FROM q JOIN cells c USING (cell) WHERE query_id <> c.id
    )
    SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """
@register_parity("sim_ann_ivf", _ann_ivf_sql())
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via IVF inverted lists (argmax-dimension quantizer)."""
    return similarity.ann_topk_ivf(
        load_table(spark, sf_dir, "embeddings"), num_queries=8, k=5
    )
@register_parity(
    "analytics_q10_returns",
    """
    SELECT c_custkey, c_name, c_acctbal, n_name,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS VARCHAR) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    """,
)
def analytics_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shape: returned-item revenue per customer, one
    quarter; nation broadcast, scaling joins left to AQE."""
    out = analytics.q10_returned_items(spark, sf_dir)
    return out.select(
        "c_custkey", "c_name", "c_acctbal", "n_name",
        F.col("revenue").cast("decimal(18,4)").cast("string").alias("revenue"),
    )
@register_parity(
    "analytics_q19_disjunctive",
    """
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS VARCHAR) AS revenue,
           count(1) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
)
def analytics_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shape: disjunctive predicates — one scan, one join,
    partial conjuncts pushed below the join (plan-tested)."""
    out = analytics.q19_disjunctive_revenue(spark, sf_dir)
    return out.select(
        F.col("revenue").cast("decimal(18,4)").cast("string").alias("revenue"),
        "n_items",
    )
@register_parity(
    "analytics_q7_volume",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS VARCHAR) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(extract(year FROM l_shipdate) AS INT) AS l_year,
               l_extendedprice, l_discount
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def analytics_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shape: nation-pair shipping volume by year."""
    out = analytics.q7_volume_shipping(spark, sf_dir)
    return out.select(
        "supp_nation", "cust_nation", "l_year",
        F.col("revenue").cast("decimal(18,4)").cast("string").alias("revenue"),
    )
@register_parity(
    "analytics_event_funnel",
    """
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t0,
               min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t1,
               min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t2
        FROM events GROUP BY user_id
    )
    SELECT CAST(sum(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_step1,
           CAST(sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_step2,
           CAST(sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
                              AND t2 IS NOT NULL AND t2 > t1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_step3
    FROM firsts
    """,
)
def analytics_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view->click->purchase funnel: conditional-min firsts
    per user, one shuffle, no joins."""
    return analytics.event_funnel(spark, sf_dir)
@register_parity(
    "analytics_q6_forecast",
    """
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS VARCHAR) AS revenue,
           count(1) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def analytics_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shape: scan-filter-aggregate, all predicates pushed."""
    out = analytics.q6_forecast_revenue(spark, sf_dir)
    return out.select(
        F.col("revenue").cast("decimal(18,4)").cast("string").alias("revenue"),
        "n_items",
    )
@register_parity(
    "analytics_q14_promo",
    """
    SELECT CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
                              THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                              ELSE CAST(0 AS DECIMAL(14,4)) END) AS DECIMAL(18,4)) AS VARCHAR) AS promo_revenue,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS VARCHAR) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def analytics_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shape: promo share via conditional aggregation."""
    out = analytics.q14_promo_revenue_share(spark, sf_dir)
    return out.select(
        F.col("promo_revenue").cast("decimal(18,4)").cast("string").alias("promo_revenue"),
        F.col("total_revenue").cast("decimal(18,4)").cast("string").alias("total_revenue"),
    )
@register_parity(
    "analytics_q13_custdist",
    """
    SELECT c_count, count(1) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def analytics_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shape: orders-per-customer histogram incl. the
    zero-order bucket (left outer join + stacked aggregations)."""
    return analytics.q13_order_count_distribution(spark, sf_dir)
@register_parity(
    "analytics_q18_large_orders",
    """
    WITH big AS (
        SELECT l_orderkey,
               sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 300
    )
    SELECT c_custkey, c_name, o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
           CAST(CAST(total_qty AS DECIMAL(18,2)) AS VARCHAR) AS total_qty
    FROM orders
    JOIN big ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
    """,
)
def analytics_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shape: HAVING subquery as aggregate + filter + join."""
    return analytics.q18_large_volume_customers(spark, sf_dir, threshold=300)


def _simhash128_pairs_sql(max_dist: int = 3, bands: int = 4, max_bucket: int = 16) -> str:
    """128-bit twin of _simhash64_pairs_sql (r11 verdict task 4): a
    second sketch long from md5 hex digits 17-31 (bits 64-123) and
    digit 32 (bits 124-127); 32-bit bands — two per long, never
    straddling; hamming = bit_count(lo xor) + bit_count(hi xor)."""
    srcs = (("h", 0, 60), ("hx", 60, 64), ("h2", 64, 124), ("hx2", 124, 128))

    def bit_sums(lo: int, hi: int) -> str:
        out = []
        for i in range(lo, hi):
            src, base, _ = next(s for s in srcs if i < s[2])
            out.append(
                f"sum(CASE WHEN ({src} >> {i - base}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
            )
        return ",\n           ".join(out)

    def sketch(lo: int) -> str:
        terms = [
            f"(CASE WHEN b{lo + i} >= 0 THEN 1 ELSE 0 END) * {1 << i}"
            for i in range(63)
        ]
        terms.append(
            f"(CASE WHEN b{lo + 63} >= 0 THEN 1 ELSE 0 END) * (-9223372036854775808)"
        )
        return " + ".join(terms)

    bw = 128 // bands
    mask = (1 << bw) - 1
    band_rows = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id AS id, {b} AS band, "
        f"({'lo' if b * bw < 64 else 'hi'} >> {(b * bw) % 64}) & {mask} AS bv FROM sig"
        for b in range(bands)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
    ),
    hs AS (SELECT doc_id, {_H.format(x='tok')} AS h,
                  CAST(nullif(concat('0x', substr(md5(tok),16,1)), '0x') AS BIGINT) AS hx,
                  CAST(nullif(concat('0x', substr(md5(tok),17,15)), '0x') AS BIGINT) AS h2,
                  CAST(nullif(concat('0x', substr(md5(tok),32,1)), '0x') AS BIGINT) AS hx2
           FROM toks WHERE tok <> ''),
    bits AS (SELECT doc_id, {bit_sums(0, 64)},
           {bit_sums(64, 128)} FROM hs GROUP BY doc_id),
    sig AS (SELECT doc_id, CAST({sketch(0)} AS BIGINT) AS lo,
                   CAST({sketch(64)} AS BIGINT) AS hi FROM bits),
    banded AS (
        {band_rows}
    ),
    bsz AS (SELECT band, bv FROM banded GROUP BY band, bv HAVING count(1) <= {max_bucket}),
    capped AS (SELECT id, banded.band, banded.bv FROM banded JOIN bsz USING (band, bv)),
    cand AS (
        SELECT DISTINCT x.id AS id_a, y.id AS id_b
        FROM capped x JOIN capped y USING (band, bv)
        WHERE x.id < y.id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(sa.lo, sb.lo)) + bit_count(xor(sa.hi, sb.hi)) AS INT) AS hamming
    FROM cand
    JOIN sig sa ON id_a = sa.doc_id
    JOIN sig sb ON id_b = sb.doc_id
    WHERE bit_count(xor(sa.lo, sb.lo)) + bit_count(xor(sa.hi, sb.hi)) <= {max_dist}
    """


@register_parity("dedup_simhash128_pairs", _simhash128_pairs_sql())
def dedup_simhash128_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """128-bit SimHash near-dup pairs (r11 verdict task 4): 4x32-bit
    bands (~4x10^9 values/band) — the encoded step past simhash64's
    measured ~10^6-10^7-doc band saturation (SCALE.md r11)."""
    return dedup.simhash_hamming_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        max_dist=3, bands=4, max_bucket=16, width=128,
    )


# ---------------------------------------------------------------------------
# Octave-only queries (tools/scale_octave.py): measurement variants
# with no gate of their own — they live HERE with the other non-driver
# query definitions (the registry the octave harness already resolves
# against), keeping tools/ to the harness mechanics.
# ---------------------------------------------------------------------------

_EMB_N: dict[str, int] = {}


def emb_count(spark: SparkSession, d: str) -> int:
    """Memoized embeddings row count, prewarmed by scale_octave.main()
    BEFORE the timed loop so sized/default rows time only the plan,
    not a second table load + count action (r13 ADVICE)."""
    if d not in _EMB_N:
        _EMB_N[d] = load_table(spark, d, "embeddings").count()
    return _EMB_N[d]


def _adaptive_filter_default(spark: SparkSession, d: str) -> DataFrame:
    # the text_adaptive_filter pipeline with group_quantiles' DEFAULT
    # (percentile_approx) — the r13 task-1 octave row; persists the
    # scored table exactly like the parity gate (see its docstring)
    docs = load_table(spark, d, "documents")
    q = text_ops.quality_features(docs, "doc_id", "text").join(
        docs.select("doc_id", "lang"), on="doc_id"
    ).persist()
    cut = sampling.group_quantiles(q, "lang", "quality", [0.1])
    return (
        q.join(F.broadcast(cut), on="lang")
        .where(F.col("quality") >= F.col("q_10"))
        .select("doc_id", "lang")
    )


def _semantic_ivf_sized(spark: SparkSession, d: str) -> DataFrame:
    # the FULL sized path, training included (derive k ∝ n, train,
    # serve) — the r13 task-3 octave row at the scale where the
    # static 2*dim quantizer measured 7.29x at 103x output. Training
    # is flat Lloyd's at O(n*k) per pass — quadratic when k ∝ n, the
    # documented one-time boundary (ivf_k_for_corpus docstring); the
    # _serve twin below isolates the RECURRING cost.
    emb = load_table(spark, d, "embeddings")
    k = similarity.ivf_k_for_corpus(emb_count(spark, d))
    cb = similarity.ivf_train_codebook(emb, k=k)
    return dedup.semantic_dup_pairs_ivf(emb, threshold=0.4, codebook=cb)


_CODEBOOK: dict[str, list] = {}


def sized_codebook(spark: SparkSession, d: str) -> list:
    """Memoized derived-k trained codebook per dir — prewarmed by
    scale_octave.main() so the _serve row times ONLY the recurring
    serving plan (cell attach + capped within-cell pairs); training is
    the one-time per-corpus-snapshot cost the full _sized row carries."""
    if d not in _CODEBOOK:
        emb = load_table(spark, d, "embeddings")
        _CODEBOOK[d] = similarity.ivf_train_codebook(
            emb, k=similarity.ivf_k_for_corpus(emb_count(spark, d)))
    return _CODEBOOK[d]


OCTAVE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # production threshold: witnesses the r10 "output-bound, not
    # plan decay" adjudication of the 8.6x cos>=0.4 reading
    "dedup_embedding_cosine_lsh_t09": lambda spark, d:
        dedup.embedding_near_dup_pairs_lsh(
            load_table(spark, d, "embeddings"), threshold=0.9,
            num_planes=16, bands=4, dim=64, max_bucket=None,
        ).select("id_a", "id_b"),
    # the sizing discipline's witness (planes ~ log2(n)): 24 planes
    # = 6/band, sized for the 20k-vector sf1 synth — the r11 t09 row
    # measured FIXED 16 planes going 12x at 10x input (constant
    # per-band collision rate => candidates ~ n^2), which is what
    # this knob exists to hold flat
    "dedup_embedding_cosine_lsh_t09_p24": lambda spark, d:
        dedup.embedding_near_dup_pairs_lsh(
            load_table(spark, d, "embeddings"), threshold=0.9,
            num_planes=24, bands=4, dim=64, max_bucket=None,
        ).select("id_a", "id_b"),
    # r11 task 1's done-criterion row: the DEFAULT path (planes
    # derived from expected_count, band cap ON); a production
    # caller knows the corpus size as pipeline config
    "dedup_embedding_cosine_lsh_t09_default": lambda spark, d:
        dedup.embedding_near_dup_pairs_lsh(
            load_table(spark, d, "embeddings"), threshold=0.9,
            dim=64, expected_count=emb_count(spark, d),
        ).select("id_a", "id_b"),
    "text_adaptive_filter_approx": _adaptive_filter_default,
    "dedup_semantic_ivf_sized": _semantic_ivf_sized,
    "dedup_semantic_ivf_sized_serve": lambda spark, d:
        dedup.semantic_dup_pairs_ivf(
            load_table(spark, d, "embeddings"), threshold=0.4,
            codebook=sized_codebook(spark, d),
        ),
}
