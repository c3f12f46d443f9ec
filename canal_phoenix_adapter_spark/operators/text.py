"""Text-analysis operators for training-data pipelines (SURVEY §7.4):
language ID (stopword/n-gram heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and document fingerprinting
(min-of-window rolling hash, winnowing-lite).

All pure Column expressions — regexes are RE2/Java-compatible subsets
so the DuckDB oracle evaluates them identically; ratios are int/int
IEEE divisions (bit-identical in any engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whitespace as an EXPLICIT class, not \s: this is exactly Java \s,
# so engine behavior is unchanged — but DuckDB's RE2 \s omits \x0B,
# so the oracles can only match a class both dialects spell the same
# way (entry.py::_pin_ws_class rewrites the oracle side to this).
WS_CLASS = r" \t\n\x0B\f\r"

# BPE-ish token pattern: letter runs, digit runs, single punctuation.
BPE_TOKEN_RE = rf"[A-Za-z]+|[0-9]+|[^A-Za-z0-9{WS_CLASS}]"

# Tiny deterministic per-language marker lists (n-gram heuristic
# calibre: real lang-ID uses char n-gram profiles; the *shape* — score
# per language, argmax with deterministic tie-break — is what matters
# and is identical at any scale).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "y", "es"],
    "fr": ["le", "la", "les", "et", "est"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "on", "for"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization — THE tokenizer shared by every
    cross-module hash pipeline (shingles in dedup.py, chunks, vocab).
    One definition on purpose: two drifting copies would silently
    desynchronize shingle hashes vs chunk hashes built from the same
    text."""
    return F.split(F.trim(text), rf"[{WS_CLASS}]+")


_tokens = tokens


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.array_remove(_tokens(text), ""))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: letter runs + digit runs + punctuation."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language over the token multiset."""
    toks = _tokens(F.lower(text))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        out[lang] = F.size(
            F.filter(toks, lambda t: t.isin(*markers))  # noqa: B023
        )
    return out


def lang_id(text: Column, default: str = "und") -> Column:
    """Predicted language: argmax marker-hit count, ties broken by
    language code order; 0 hits -> 'und'."""
    scores = lang_scores(text)
    langs = sorted(scores)  # deterministic tie-break: alphabetical
    best_lang = F.lit(default)
    best_score = F.lit(0)
    for lang in reversed(langs):  # earlier langs win ties (checked last)
        s = scores[lang]
        best_lang = F.when(s >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(
            best_lang
        )
        best_score = F.greatest(best_score, s)
    return best_lang


def _check_carry(df: DataFrame, carry: tuple[str, ...], produced: set[str],
                 op: str, id_col: str) -> None:
    """Carry columns are pure pass-through plumbing — a carry name that
    collides with a column the operator generates (or the id itself)
    would silently produce duplicate/ambiguous output columns; fail
    loudly at plan-build time instead. The comparison follows the
    session's resolution rule: lowercased under the default
    case-insensitive analyzer ('Quality' collides with 'quality'),
    exact when spark.sql.caseSensitive=true (distinct names are legal
    there, so the guard must not reject them)."""
    cs = (df.sparkSession.conf.get("spark.sql.caseSensitive", "false")
          or "false").lower() == "true"
    norm = (lambda s: s) if cs else str.lower
    lowered = {norm(p) for p in produced} | {norm(id_col)}
    clash = sorted(c for c in carry if norm(c) in lowered)
    if clash:
        raise ValueError(
            f"{op}: carry columns {clash} collide with columns the "
            "operator produces (or the id column); rename them upstream")


def quality_features(df: DataFrame, id_col: str, text_col: str,
                     carry: tuple[str, ...] = ()) -> DataFrame:
    """Per-doc quality features + composite score.

    Features (all engine-portable): char length, whitespace tokens,
    mean token length, stopword ratio, punctuation ratio, digit ratio.
    quality = stopword_ratio * 0.4 + (1 - punct_ratio) * 0.3
            + (1 - digit_ratio) * 0.3   (identical expression tree in
    the oracle -> identical doubles).

    Degenerate docs are guarded, not NaN'd: an empty or whitespace-
    only doc has n_tokens = 0 (or n_chars = 0), and the unguarded
    ratio would be 0.0/0 = NaN — which sorts GREATER than every
    double in Spark, so NaN-quality empty docs would pass every
    quality>=cut filter and skew per-group quantile thresholds.
    Ratios and quality are 0.0 for such docs (no content = lowest
    quality); NULL text stays NULL throughout.

    STAGED projections on purpose: codegen does NOT subexpression-
    eliminate the expensive tokenize/regex counts across output
    columns, so a flat select mentioning stop_ratio twice re-runs the
    tokenize+filter per mention (~1.3x the operator, measured at
    sf0.1). counts -> ratios -> quality nesting makes each appear
    once; CollapseProject refuses to inline non-cheap duplicated
    expressions, so the staging survives optimization."""
    _check_carry(df, carry, {"n_chars", "n_tokens", "_stop_hits", "_n_punct",
                         "_n_digit", "stopword_ratio", "punct_ratio",
                         "digit_ratio", "quality"},
                 "quality_features", id_col)
    text = F.col(text_col)
    counts = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.length(text).alias("n_chars"),
        F.size(F.array_remove(_tokens(text), "")).alias("n_tokens"),
        F.size(
            F.filter(
                F.array_remove(_tokens(F.lower(text)), ""),
                lambda t: t.isin(*STOPWORDS),
            )
        ).alias("_stop_hits"),
        F.size(F.regexp_extract_all(text, F.lit(rf"[^A-Za-z0-9{WS_CLASS}]"), F.lit(0))).alias(
            "_n_punct"
        ),
        F.size(F.regexp_extract_all(text, F.lit(r"[0-9]"), F.lit(0))).alias("_n_digit"),
    )

    def _guard(n: F.Column, ratio: F.Column) -> F.Column:
        return (
            F.when(n.isNull(), F.lit(None).cast("double"))
            .when(n > 0, ratio)
            .otherwise(F.lit(0.0))
        )

    nt, nc = F.col("n_tokens"), F.col("n_chars")
    ratios = counts.select(
        id_col,
        *carry,
        "n_chars",
        "n_tokens",
        _guard(nt, F.col("_stop_hits").cast("double") / nt).alias("stopword_ratio"),
        _guard(nc, F.col("_n_punct").cast("double") / nc).alias("punct_ratio"),
        _guard(nc, F.col("_n_digit").cast("double") / nc).alias("digit_ratio"),
    )
    return ratios.select(
        id_col,
        *carry,
        "n_chars",
        "n_tokens",
        "stopword_ratio",
        "punct_ratio",
        "digit_ratio",
        _guard(
            nt,
            F.col("stopword_ratio") * F.lit(0.4)
            + (F.lit(1.0) - F.col("punct_ratio")) * F.lit(0.3)
            + (F.lit(1.0) - F.col("digit_ratio")) * F.lit(0.3),
        ).alias("quality"),
    )


def repetition_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals for corpus filtering: documents
    dominated by repeated lines or one repeated phrase are boilerplate
    (nav bars, SEO spam, scraped tables) and get filtered before
    training.

    Per doc: ``n_lines`` (non-empty trimmed lines), ``dup_line_frac``
    (1 - distinct/total lines), ``n_bigrams`` (word-bigram
    occurrences), ``top_bigram_frac`` (share of the most frequent
    bigram).

    ALL features are pure array expressions — the operator is a
    single projection with zero shuffles. The top-bigram count is the
    longest run in the per-row SORTED bigram array (array_sort +
    aggregate run-length, O(B log B) per row) — not the former
    explode -> groupBy(doc, bigram) -> groupBy(doc), which shuffled
    the exploded bigram table twice (r14, guide §2.4: two Exchanges +
    a Generate removed; a count-each-element array rewrite would have
    been O(B^2) per row, the sort keeps it loglinear). Identical
    values: run lengths in a sorted array ARE the per-bigram counts.
    """
    text = F.col(text_col)
    # Materialize the line/token arrays once per row BELOW the lambdas:
    # element_at(split(...), i) inside a transform re-runs the split
    # per element — O(tokens^2) per doc (see raw_shingles).
    arrays = df.select(
        F.col(id_col).alias("_id"),
        F.filter(
            F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
            lambda l: l != "",
        ).alias("_lines"),
        F.array_remove(_tokens(F.lower(text)), "").alias("_toks"),
    )
    lines, toks = F.col("_lines"), F.col("_toks")
    n_lines = F.size(lines)
    # NULL text stays NULL throughout (the quality_features convention;
    # size(NULL array) is NULL, so n_lines/n_bigrams gate the ratios):
    # an unguarded otherwise(0.0) scored NULL docs as real zero-
    # repetition documents — caught by the r10 multilingual witness
    # rows, where the oracle half-disagreed (NULL n_bigrams, 0.0 frac).
    dup_line_frac = (
        F.when(
            n_lines > 0,
            F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / n_lines,
        )
        .when(n_lines.isNotNull(), F.lit(0.0))
    )
    # sequence(1, 0) would produce a DESCENDING [1, 0] — guard short docs.
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # size(bigrams) would re-run the whole transform just to count it.
    n_bigrams = (
        F.when(F.size(toks) >= 2, F.size(toks) - 1)
        .when(toks.isNotNull(), F.lit(0))
    )
    base = arrays.select(
        "_id",
        n_lines.alias("n_lines"),
        dup_line_frac.alias("dup_line_frac"),
        n_bigrams.alias("n_bigrams"),
        F.array_sort(bigrams).alias("_sbg"),
    )

    # Longest run in the sorted array == max per-bigram count. The
    # run counter is referenced twice in the fold step (run', and
    # best' = greatest(best, run')), so it is built by a helper for
    # one definition. Empty array -> best 0 (bigram-less docs),
    # mirroring the old count-ignores-null explode_outer behavior.
    def _run(acc: Column, x: Column) -> Column:
        return (
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
        )

    top_cnt = F.aggregate(
        F.col("_sbg"),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            _run(acc, x).alias("run"),
            F.greatest(acc["best"], _run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return base.select(
        F.col("_id").alias(id_col),
        "n_lines",
        "dup_line_frac",
        "n_bigrams",
        F.when(
            F.col("n_bigrams") > 0,
            top_cnt.cast("double") / F.col("n_bigrams"),
        )
        .when(F.col("n_bigrams").isNotNull(), F.lit(0.0))
        .alias("top_bigram_frac"),
    )


def fingerprint(text: Column, window: int = 8) -> Column:
    """Winnowing-lite document fingerprint: min md5 over every
    ``window``-char substring. Expressed as array_min(transform(...))
    — zero shuffles, zero UDFs, one pass over the string."""
    n = F.greatest(F.length(text) - (window - 1), F.lit(1))
    return F.array_min(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.md5(text.substr(i, F.lit(window))),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing + chunk-level boilerplate removal (training-data
# hygiene passes: every web-scale corpus runs both before training)
# ---------------------------------------------------------------------------

# RE2/Java-common regex subset (no lookaround/backrefs) so the DuckDB
# oracle evaluates the identical patterns.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"[0-9]{1,3}(\.[0-9]{1,3}){3}"


def pii_scrub(df: DataFrame, id_col: str, text_col: str,
              carry: tuple[str, ...] = ()) -> DataFrame:
    """Redact emails and IPv4 literals: per-doc match counts + the
    scrubbed text. Pure Column expressions (JVM regex inside
    whole-stage codegen, zero shuffles) — the canonical shape for a
    100 TB scrub pass: it pipelines with the parquet scan and never
    materializes an intermediate.

    Emails are replaced first, and ``n_ips`` is counted on the
    email-scrubbed text — so an IPv4-looking run inside an email
    (a@10.1.2.3.com) is redacted once as part of the email and never
    double-counted as an IP; counts always equal actual <IP>
    replacements. IPV4_RE is deliberately boundary-free (Java and
    DuckDB RE2-subset compatible): inside a longer dotted run like
    1.2.3.4.5 it matches the first four octets — over-redaction, the
    conservative direction for a scrubber."""
    _check_carry(df, carry, {"n_emails", "n_ips", "text_scrubbed"},
                 "pii_scrub", id_col)
    t = F.col(text_col)
    no_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],  # narrow pass-through, still zero-shuffle
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, F.lit(IPV4_RE), F.lit(0))).alias("n_ips"),
        F.regexp_replace(no_email, IPV4_RE, "<IP>").alias("text_scrubbed"),
    )


def doc_chunks(
    df: DataFrame, id_col: str, text_col: str, size: int = 8,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Explode documents into fixed-size token chunks: (id, pos,
    chunk). The segmentation unit for cross-document "paragraph"
    dedup / boilerplate removal on corpora without reliable newline
    structure (chunk = ``size`` consecutive whitespace tokens).
    ``carry`` keeps narrow per-doc columns on every chunk row so
    downstream per-doc aggregates first()-reassemble them instead of
    paying a data-scale join-back (the repetition_features idiom).

    The token array is materialized in a projection below the
    generator (one regex split per row, not per chunk — see
    raw_shingles in dedup.py for the O(tokens^2) trap this avoids)."""
    _check_carry(df, carry, {"pos", "chunk", "__toks"}, "doc_chunks", id_col)
    toks_df = df.select(F.col(id_col), *[F.col(c) for c in carry],
                        _tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    # chunk count = floor((len-1)/size)+1 — int-free-of-float on both
    # engines via floor of an exact small-int division.
    last = F.floor(
        (F.greatest(F.size(toks), F.lit(1)) - 1) / F.lit(float(size))
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), last),
        lambda i: F.concat_ws(" ", F.slice(toks, i * size + 1, size)),
    )
    return toks_df.select(
        F.col(id_col), *[F.col(c) for c in carry],
        F.posexplode(chunks).alias("pos", "chunk"),
    ).where(F.col("chunk") != "")


def boilerplate_strip(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 8,
    max_df: int = 2,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """CCNet-style boilerplate removal: drop every chunk that appears
    in more than ``max_df`` distinct documents (nav bars, license
    headers, SEO footers), then reassemble each document from its
    surviving chunks in order.

    Scale shape: explode -> hash chunks to 8-byte bigints -> doc-freq
    aggregate (map-side partial combine; the hot-chunk table is tiny
    by construction — only chunks with df > max_df survive it) ->
    LEFT ANTI join back (AQE broadcasts the hot set) -> one groupBy
    per doc to reassemble. Text crosses the wire once, as chunks, for
    the reassembly shuffle; the frequency pass ships only hashes.

    Documents whose every chunk is boilerplate vanish from the output
    (that is the correct pipeline behavior: nothing left to train on).
    Returns (id, *carry, n_kept_chunks, text_clean) — ``carry`` rides
    the chunk rows through the one reassembly shuffle (narrow per-doc
    scalars, first()-reassembled): no join-back needed downstream."""
    from canal_phoenix_adapter_spark.functions.hashing import md5_long

    _check_carry(df, carry, {"pos", "chunk", "__toks", "__h", "n_kept_chunks",
                         "text_clean"}, "boilerplate_strip", id_col)

    # persist: ch feeds BOTH the hot-chunk doc-freq aggregate and the
    # anti-join probe — uncached, the corpus-wide chunk explode + hash
    # runs twice (dedup's multi-consumer persist contract; callers own
    # cache release).
    ch = doc_chunks(df, id_col, text_col, size, carry=carry).select(
        F.col(id_col), *[F.col(c) for c in carry],
        F.col("pos"), F.col("chunk"),
        md5_long(F.col("chunk")).alias("__h"),
    ).persist()
    hot = (
        ch.select(id_col, "__h")
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__d"))
        .where(F.col("__d") > max_df)
        .select("__h")
    )
    kept = ch.join(hot, on="__h", how="left_anti")
    return (
        kept.groupBy(id_col)
        .agg(
            *[F.first(c).alias(c) for c in carry],
            F.count(F.lit(1)).alias("n_kept_chunks"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("text_clean"),
        )
    )
