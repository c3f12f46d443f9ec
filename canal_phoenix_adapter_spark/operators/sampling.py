"""Dataset-assembly operators for training pipelines: deterministic
splits, per-group exact quantiles, vocabulary building, benchmark
contamination checks (SURVEY.md §7.4 extension surface).

Every operator is pure DataFrame algebra with md5-derived determinism
(functions/hashing.py), so the DuckDB oracle reproduces results
bit-for-bit and a re-run on different cluster sizes / partition
counts yields the identical dataset — the property training-data
reproducibility actually requires (Spark's rand()/sample() reshuffle
per retry; a hash split never does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from canal_phoenix_adapter_spark.functions.hashing import md5_long
from canal_phoenix_adapter_spark.operators.text import tokens as _tokens


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = md5(salt,key)
    mod 10_000, split boundaries at cumulative fractions. Same key ->
    same split, forever, on any cluster — and adding a new split
    rescales nothing that matters (boundaries only move at the edge).

    Returns df + a `split` column. Fractions must sum to <= 1; any
    remainder is labeled 'rest'."""
    total = sum(fractions.values())
    if total > 1.000001:
        raise ValueError(f"fractions sum to {total} > 1")
    bucket = md5_long(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))) % 10_000
    expr = None
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        cond = bucket < int(round(acc * 10_000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr.otherwise("rest"))


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[float],
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group discrete quantiles: one row per group with a
    `q_<pct>` column per requested quantile, values always drawn FROM
    the group's data (never interpolated doubles).

    DEFAULT (exact=False): ``percentile_approx`` — a single hash
    aggregate with full map-side partial combine and a bounded
    (``accuracy``-sized) per-group summary, so the plan has NO window
    and NO per-group single-task sort; rank error is bounded by
    n/accuracy. This is the 100 TB path: the exact mode's rank window
    funnels each group's full value set through ONE task, measured
    compounding at ~6.4x wall per data decade on a real corpus (r12
    verdict; SCALE.md decade rows) — correct, and unusable at corpus
    scale, so approx is the governed default and exact the explicit
    opt-in, the same defaults discipline as the LSH family caps.

    EXACT (exact=True): percentile_disc semantics — the q-quantile is
    the value at 1-based rank ceil(q * n) in the group's sort order,
    deterministic and engine-agnostic (the oracle-parity config; the
    gates pin it). Cost ceiling is the hottest group's row count
    sorted in one task — acceptable when groups are known-small.

    Quantiles that round to the same whole percent (e.g. 0.115 and
    0.125) would silently alias to one column name — rejected up
    front instead of emitting a DataFrame with duplicate columns that
    throws AMBIGUOUS_REFERENCE on first use.

    NULL values are EXCLUDED up front in both modes (standard
    percentile_disc semantics): engines disagree on where NULL sorts
    (Spark windows default NULLS FIRST ascending, DuckDB NULLS
    LAST), so a NULL inside the ranked set would both desynchronize
    the oracle and poison value-at-rank with a NULL threshold. A
    group whose values are all NULL yields no output row."""
    names = [f"q_{int(round(q * 100))}" for q in quantiles]
    if len(set(names)) != len(names):
        raise ValueError(
            f"quantiles {quantiles} collide on column names {names}; "
            "q_<pct> naming needs quantiles at least a whole percent apart"
        )
    vals = df.where(F.col(value_col).isNotNull())
    if not exact:
        # ONE summary per group (array percentage), not one agg per
        # quantile — K percentile_approx calls would build K summaries
        qs = vals.groupBy(group_col).agg(
            F.percentile_approx(
                F.col(value_col), [float(q) for q in quantiles], accuracy
            ).alias("__qs")
        )
        return qs.select(
            group_col,
            *[F.element_at("__qs", i + 1).alias(nm)
              for i, nm in enumerate(names)],
        )
    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    ranked = vals.select(
        F.col(group_col),
        F.col(value_col),
        F.row_number().over(w).alias("__rk"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("__n"),
    )
    aggs = []
    for q in quantiles:
        # round(q*n, 9) before ceil: IEEE q*n can land an ulp ABOVE an
        # exactly-representable rank (0.07 * 100 = 7.000000000000001,
        # ceil -> 8) — off by one from the documented ceil(q*n)
        # semantics. The 1e-9 snap restores the exact integer; real
        # non-integer targets are nowhere near an ulp of an integer.
        pos = F.ceil(F.round(F.lit(q) * F.col("__n"), 9))
        aggs.append(
            F.max(F.when(F.col("__rk") == F.greatest(pos, F.lit(1)), F.col(value_col)))
            .alias(f"q_{int(round(q * 100))}")
        )
    return ranked.groupBy(group_col).agg(*aggs)


def vocab_topk(
    df: DataFrame,
    text_col: str,
    k: int = 20,
    min_len: int = 1,
) -> DataFrame:
    """Corpus vocabulary: top-k whitespace tokens by document
    frequency (ties broken lexicographically). The wordcount of
    training pipelines: one explode + two partial-aggregated shuffles
    (token df, then the global top-k via window over a single
    ordering key). Lowercased; tokens shorter than min_len dropped.

    At 100 TB the explode dominates; there is no per-token state
    beyond the aggregation — no collect, no driver-side vocabulary.
    The global top-k runs as orderBy().limit(k), which Spark plans as
    TakeOrderedAndProject — per-partition top-k merged on one tiny
    result — NOT as a global-window sort that would drag the whole
    vocabulary through a single task; the rank window then orders only
    the k surviving rows, partitioned by a constant so WindowExec
    never logs its move-everything-to-one-partition warning (k rows in
    one partition is the intent, and a noisy benign warning trains
    readers to ignore the one that matters). The constant must be
    NON-FOLDABLE: Catalyst strips partition keys it can prove
    constant (a literal folds; so does ``doc_freq * 0`` — doc_freq
    is non-nullable, so the mul-by-zero simplifies — and the
    partitionSpec comes out empty, warning back). ``doc_freq -
    doc_freq`` survives: no x - x rewrite exists, so the optimizer
    keeps the key and WindowExec sees a one-group partition."""
    # THE shared whitespace tokenizer (text.tokens — one definition so
    # the vocabulary can never drift from the shingle/chunk token
    # stream built from the same text); trim(lower(x)) == lower(trim(x))
    # for whitespace, so lowering before tokenizing is equivalent.
    toks = df.select(
        F.explode(
            F.array_distinct(_tokens(F.lower(F.col(text_col))))
        ).alias("token")
    ).where(F.length("token") >= min_len)
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    top = counts.orderBy(F.col("doc_freq").desc(), F.col("token").asc()).limit(k)
    w = Window.partitionBy(F.col("doc_freq") - F.col("doc_freq")).orderBy(
        F.col("doc_freq").desc(), F.col("token").asc()
    )
    return top.select(
        F.row_number().over(w).alias("rank"), "token", "doc_freq"
    )


def contamination_hits(
    docs: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_col: str = "probe",
) -> DataFrame:
    """Benchmark-contamination scan: which documents contain which
    probe strings (eval-set n-grams, canary strings). The probe set is
    small by construction (an eval suite), so it broadcasts and the
    scan streams: contains() per (doc, probe) without ever shuffling
    document text. Returns one row per contaminated doc:
    (doc_id, n_probes_hit, first_probe).

    Substring semantics (`contains`), not token-boundary — the
    conservative choice for decontamination (over-matches rather than
    under-matches)."""
    hits = docs.join(
        F.broadcast(probes),
        F.col(text_col).contains(F.col(probe_col)),
    )
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_probes_hit"),
        F.min(probe_col).alias("first_probe"),
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff
    md5(salt, key) mod 10_000 falls under its stratum's rate (e.g.
    lang -> rate for domain/language rebalancing). Same key -> same
    decision on any cluster, any retry — unlike df.sampleBy, whose
    Bernoulli draws reshuffle per task retry.

    Pure filter on a scan-side projection: no shuffle, no UDF; at
    100 TB this pipelines with the parquet read and prunes rows
    before anything downstream pays for them."""
    bucket = md5_long(
        F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))
    ) % 10_000
    thr = F.lit(int(round(default_rate * 10_000)))
    for name, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == name, F.lit(int(round(rate * 10_000)))
        ).otherwise(thr)
    return df.where(bucket < thr)


def pack_sequences(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    num_groups: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Token-budget sequence packing: assign each document to a
    (pack_group, bin_id) so that consecutive documents within a group
    fill ~``budget`` tokens per bin (the pretraining step that packs
    short documents into fixed-length training sequences).

    Budget-aligned contiguous binning: docs are laid out in key order
    within their group and bin = floor(exclusive-prefix-sum / budget).
    A doc whose exclusive prefix lands below a boundary joins that bin
    even when it pushes the bin past the budget — bins OVERFLOW rather
    than split or pad (callers that need hard <=budget sequences
    truncate/segment oversized docs first). This keeps the assignment
    a pure window expression: deterministic, one shuffle, and
    SQL-reproducible — break-before-crossing packing would need a
    sequential scan per group.

    Scale shape: the md5 group key spreads the corpus over
    ``num_groups`` independent packing streams, so the window sort is
    per-group (shuffle + sort on group, not a global sort) and
    ``num_groups`` scales with the cluster. Deterministic: same keys
    -> same packing, any partitioning."""
    g = md5_long(
        F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))
    ) % num_groups
    out = df.select(
        F.col(key_col), F.col(tokens_col), g.alias("pack_group")
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return out.select(
        key_col,
        "pack_group",
        F.floor(prefix / F.lit(float(budget))).cast("long").alias("bin_id"),
        F.col(tokens_col).alias("n_tokens"),
    )
