"""HTML main-content extraction + layout reading-order parse — the
planted-truth invariant (recovered text == original) plus engine parity
and targeted chrome/column semantics."""

from __future__ import annotations

import duckdb
import pandas as pd

from easyocr_spark.operators import web_extract


def _pdf(n=9):
    return pd.DataFrame(
        {
            "doc_id": range(n),
            "text": [
                " ".join(f"tok{(i * 5 + j) % 31}" for j in range(7 + 3 * i))
                for i in range(n)
            ],
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": [0] * n,
        }
    )


# ---------------------------------------------------------------- HTML
def test_html_extract_recovers_original_and_drops_chrome(spark):
    pdf = _pdf()
    out = web_extract.html_extract(spark.createDataFrame(pdf)).toPandas()
    # the whole point: main content == original document text for every
    # page, nav/ad/footer/script/style all rejected
    assert out.matches_original.all()
    import hashlib

    for did, text in zip(pdf.doc_id, pdf.text):
        row = out[out.doc_id == did].iloc[0]
        assert row.main_md5 == hashlib.md5(text.encode()).hexdigest()
        # exactly the two <p> halves survive
        assert row.n_kept == 2
        assert row.main_words == len(text.split())


def test_html_extract_engine_parity(spark):
    pdf = _pdf(12)
    got = (
        web_extract.html_extract(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = (
        con.sql(web_extract.duckdb_html_extract_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for col in got.columns:
        assert list(got[col]) == list(exp[col]), col


def test_html_link_density_rule_directly(spark):
    """A link-heavy paragraph inside the CONTENT area must also drop —
    the rule is density-based, not tag-position-based. Feed the block
    filter a crafted doc whose first half is one giant anchor."""
    # doc text engineered so p1 ends up mostly anchor text after the
    # build: we can't inject tags via text (they'd be literal), so
    # instead check the arithmetic on the synthetic chrome: the ad div
    # has 17 anchor chars / 18 visible -> 944 milli > 300 -> dropped,
    # while a 3-word no-link paragraph is kept. Those are both already
    # asserted via n_kept == 2; here pin the threshold boundary: a
    # block at exactly the limit is KEPT (<=, not <).
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.lit('<p><a href="x">abc</a> defghi</p>').alias("b")
    )
    kept = df.select(
        F.filter(
            F.split(F.col("b"), web_extract.BLOCK_SPLIT_RE),
            lambda blk: (
                F.size(F.split(web_extract._block_text(blk), r"\s+")) >= 1
            )
            & (web_extract._block_text(blk) != F.lit(""))
            & (
                F.aggregate(
                    F.regexp_extract_all(
                        blk, F.lit(web_extract.ANCHOR_TEXT_RE), 1
                    ),
                    F.lit(0),
                    lambda acc, t: acc + F.length(F.trim(t)),
                )
                * 1000
                <= F.length(web_extract._block_text(blk)) * 300
            ),
        ).alias("k")
    ).collect()[0]["k"]
    # anchor 'abc' = 3 chars, text 'abc defghi' = 10 chars -> exactly 300
    assert len(kept) == 1


# -------------------------------------------------------------- layout
def test_layout_reading_order_recovers_token_order(spark):
    pdf = _pdf()
    out = web_extract.layout_reading_order(
        spark.createDataFrame(pdf)
    ).toPandas()
    assert out.matches_original.all()
    # line/page accounting: ceil(tokens/4) lines, 8 lines per page
    for did, text in zip(pdf.doc_id, pdf.text):
        row = out[out.doc_id == did].iloc[0]
        n_toks = len(text.split())
        n_lines = (n_toks + 3) // 4
        assert row.n_lines == n_lines
        assert row.n_pages == (n_lines + 7) // 8


def test_layout_survives_input_shuffle(spark):
    """The extractor's contract is an UNORDERED line set: repartitioned
    and pre-shuffled input must yield identical reconstructions."""
    pdf = _pdf(6)
    base = web_extract.layout_reading_order(
        spark.createDataFrame(pdf)
    ).toPandas()
    scrambled = web_extract.layout_reading_order(
        spark.createDataFrame(pdf.sample(frac=1.0, random_state=3))
        .repartition(7)
    ).toPandas()
    b = base.sort_values("doc_id").reset_index(drop=True)
    s = scrambled.sort_values("doc_id").reset_index(drop=True)
    for col in b.columns:
        assert list(b[col]) == list(s[col]), col


def test_layout_engine_parity(spark):
    pdf = _pdf(11)
    got = (
        web_extract.layout_reading_order(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = (
        con.sql(web_extract.duckdb_layout_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for col in got.columns:
        assert list(got[col]) == list(exp[col]), col
