"""Per-round oracle verification for the FOLDED gates
(tests/parity_registry.py): every parity query runs against its DuckDB
oracle with the driver's own compare semantics (row count + columns +
order-insensitive normalized values) at the driver's gate SF (sf0.01).

This is what keeps the r4 registry fold honest: the 35 queries folded
out of the driver artifact are still value-verified on every pytest
pass — same method, same scale factor, same parquet — so a regression
in any of them fails CI even though the driver no longer records them.

Override the scale factor with SPARK_GRAFT_PARITY_SF (e.g. a quick
local iteration at /root/testdata/sf0.001).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.parity_registry import PARITY_ORACLE, PARITY_QUERIES  # noqa: E402
from tests.check_correctness import TABLES, canon  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")


def test_every_parity_query_has_an_oracle():
    assert set(PARITY_ORACLE) == set(PARITY_QUERIES)


def test_ws_shim_rewrites_known_idioms_and_rejects_novel_ones():
    """_pin_ws_class must rewrite the two \\s spellings the oracles use
    (RE2's \\s lacks \\x0B, Java's has it) and HARD-FAIL on any other
    \\s idiom — otherwise the dialect gap it closes silently reopens in
    the next oracle someone writes."""
    from canal_phoenix_adapter_spark.entry import _pin_ws_class

    assert _pin_ws_class("split(trim(text), '\\s+')") == (
        "split(trim(text), '[ \\t\\n\\x0b\\f\\r]+')"
    )
    assert _pin_ws_class("regexp('[^A-Za-z0-9\\s]')") == (
        "regexp('[^A-Za-z0-9 \\t\\n\\x0b\\f\\r]')"
    )
    with pytest.raises(ValueError, match="spell the whitespace class"):
        _pin_ws_class("regexp_replace(text, '\\s', ' ')")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


# Multibyte UTF-8 everywhere a byte-vs-codepoint confusion could hide:
# accents, CJK, emoji, a char straddling the 16-byte frame boundary,
# and an empty doc. The r8 caveat was that mm parity held only because
# the driver fixtures are pure ASCII; these rows prove the oracles are
# bytes-true now (hex-pair math + md5-of-hex signatures).
_NON_ASCII_DOCS = [
    (0, "héllo wörld — ça va? ünïcode päyload für das Bild"),
    (1, "audio: 日本語のテキストと中文混在，バイト数≠文字数です"),
    (2, "video 🎬 emoji 🚀 straddle: ααααααααααααααααααααααααααα end"),
    (3, "plain ascii image row for contrast, long enough to matter"),
    (4, ""),
    (5, "🎥🎥🎥🎥🎥🎥🎥🎥 four-byte codepoints only, frames split them"),
    # NULL text on an IMAGE row (6 % 3 = 0): pins the _H oracle's
    # NULL-propagation (nullif guard — DuckDB concat skips NULL args,
    # so without it the oracle ERRORS where the engine yields a NULL
    # signature) and on an audio row (7): the hx-IS-NULL branches.
    (6, None),
    (7, None),
    # every Java \s member incl. \x0B — the char RE2's \s does NOT
    # match: pins the engine/oracle whitespace-class agreement
    # (text.py WS_CLASS <-> entry._pin_ws_class) for tokenizer gates
    (8, "alpha\x0bbeta gamma\ttab\nnl\fff\rcr the of and!!"),
    # Multilingual rows for the TEXT gates (r9 verdict #7): marker
    # tokens embedded in genuinely multibyte text pin that langid /
    # vocab / fingerprint tokenization, lower(), substr() and string
    # ORDERING are codepoint-identical across engines. Row 10 carries
    # a COMBINING acute (e + U+0301) and precomposed é in the same
    # text; row 11 mixes two languages' markers to pin the tie-break.
    (9, "der Bär läuft über die Straße und ist müde, natürlich"),
    (10, "le résumé et le résumé sont lus — c'est la vie, et les idées"),
    (11, "la la el der und y es ist — ¡señor! œuvre straße"),
]


@pytest.mark.parametrize(
    "name",
    ["mm_extract_features", "mm_geometry", "mm_frame_sample", "mm_thumbnail",
     "text_quality", "text_langid", "text_vocab_topk", "text_features",
     "text_repetition"],
)
def test_mm_parity_is_bytes_true_on_non_ascii(spark, tmp_path, name):
    import pandas as pd

    from canal_phoenix_adapter_spark.entry import ORACLE, QUERIES

    queries = {**dict(QUERIES), **PARITY_QUERIES}
    oracles = {**dict(ORACLE), **PARITY_ORACLE}
    pdf = pd.DataFrame(
        {
            "doc_id": [d for d, _ in _NON_ASCII_DOCS],
            "text": [t for _, t in _NON_ASCII_DOCS],
            "lang": ["xx"] * len(_NON_ASCII_DOCS),
            "source": ["fixture"] * len(_NON_ASCII_DOCS),
            "n_chars": [len(t) if t is not None else 0 for _, t in _NON_ASCII_DOCS],
        }
    )
    sf_dir = str(tmp_path)
    pdf.to_parquet(os.path.join(sf_dir, "documents.parquet"))
    spark_pd = queries[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        duck_pd = con.sql(oracles[name]).df()
    finally:
        con.close()
    assert len(spark_pd) == len(duck_pd) > 0
    assert sorted(spark_pd.columns) == sorted(duck_pd.columns)
    a, b = canon(spark_pd), canon(duck_pd)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        pytest.fail(f"{name}: values differ on non-ASCII, e.g. {diff}")


@pytest.mark.parametrize("name", sorted(PARITY_QUERIES))
def test_parity_query_matches_oracle(spark, duck, name):
    spark.catalog.clearCache()
    spark_pd = PARITY_QUERIES[name](spark, SF_DIR).toPandas()
    duck_pd = duck.sql(PARITY_ORACLE[name]).df()
    assert len(spark_pd) == len(duck_pd), (
        f"{name}: rows {len(spark_pd)} != {len(duck_pd)}"
    )
    assert sorted(spark_pd.columns) == sorted(duck_pd.columns), (
        f"{name}: cols {sorted(spark_pd.columns)} != {sorted(duck_pd.columns)}"
    )
    a, b = canon(spark_pd), canon(duck_pd)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        pytest.fail(f"{name}: values differ, e.g. {diff}")
