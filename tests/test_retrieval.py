"""Inverted index, winnowing fingerprints, and exact length quantiles —
semantics plus DuckDB engine parity on hand-built corpora."""

from __future__ import annotations

import duckdb
import pandas as pd

from easyocr_spark.operators import dedup, retrieval
from easyocr_spark.operators import text_analysis as ta


def _con(pdf: pd.DataFrame) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register("documents", pdf)
    return con


# ------------------------------------------------------- inverted index
def test_inverted_index_semantics(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["apple banana apple", "banana cherry apple", "apple"],
        }
    )
    out = (
        retrieval.inverted_index(spark.createDataFrame(pdf), df_cap=2)
        .toPandas()
        .set_index("word")
    )
    assert out.loc["banana", "df"] == 2
    assert out.loc["banana", "total_tf"] == 2
    assert out.loc["banana", "postings"] == "1:1 2:1"
    assert out.loc["cherry", "postings"] == "2:1"
    # df=3 > cap=2: stats survive, postings suppressed
    assert out.loc["apple", "df"] == 3
    assert out.loc["apple", "total_tf"] == 4
    assert out.loc["apple", "postings"] == ""


def test_inverted_index_engine_parity(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(40)),
            "text": [f"tok{i % 7} tok{i % 3} shared" for i in range(40)],
        }
    )
    got = (
        retrieval.inverted_index(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("word")
        .reset_index(drop=True)
    )
    con = _con(pdf)
    exp = (
        con.sql(retrieval.duckdb_inverted_index_sql())
        .df()
        .sort_values("word")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"df": "int64", "total_tf": "int64"}),
        exp.astype({"df": "int64", "total_tf": "int64"}),
    )


# -------------------------------------------------- winnowing fingerprints
def test_winnowing_shared_substring_guarantee(spark):
    """Any shared substring of length >= k+w-1 must yield at least one
    shared fingerprint hash (the Schleimer coverage guarantee)."""
    shared = "zqvxkwyjmbf"  # k+w-1 = 7 < len
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [f"aaaa {shared} bbbb", f"cccc dddd {shared} eee"],
        }
    )
    out = dedup.winnowing_fingerprints(spark.createDataFrame(pdf)).toPandas()
    h1 = set(out[out["doc_id"] == 1]["fp_hash"])
    h2 = set(out[out["doc_id"] == 2]["fp_hash"])
    assert h1 & h2, "shared substring produced no shared fingerprint"


def test_winnowing_density_and_positions(spark):
    pdf = pd.DataFrame({"doc_id": [7], "text": ["the quick brown fox " * 5]})
    out = dedup.winnowing_fingerprints(spark.createDataFrame(pdf)).toPandas()
    n_grams = len("the quick brown fox " * 5) - dedup.WIN_K + 1
    # expected density 2/(w+1) = 0.4; distinct-dedup pulls it lower on
    # repetitive text — just bound it away from 0 and 1
    assert 0 < len(out) < n_grams
    assert (out["pos"] >= 0).all() and (out["pos"] < n_grams).all()
    # deterministic: rerun identical
    again = dedup.winnowing_fingerprints(spark.createDataFrame(pdf)).toPandas()
    key = ["doc_id", "pos", "fp_hash"]
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True),
        again.sort_values(key).reset_index(drop=True),
    )


def test_winnowing_engine_parity(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "pack my box with five dozen liquor jugs",
                "the quick brown fox jumps over the lazy dog again",
                "x",  # shorter than k: no fingerprints
            ],
        }
    )
    key = ["doc_id", "pos", "fp_hash"]
    got = (
        dedup.winnowing_fingerprints(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    con = _con(pdf)
    exp = (
        con.sql(dedup.duckdb_winnowing_sql("SELECT * FROM documents"))
        .df()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert (got["doc_id"] == 4).sum() == 0
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64")
    )


# ------------------------------------------------------- length quantiles
def test_length_quantiles_nearest_rank(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(10),
            "lang": ["en"] * 10,
            "text": ["x"] * 10,
            "n_chars": [10, 20, 30, 40, 50, 60, 70, 80, 90, 100],
        }
    )
    out = (
        ta.length_quantiles(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("pct")
    )
    # nearest-rank on n=10: rank = ceil(p/10)
    assert out.loc[25, "len_at_pct"] == 30
    assert out.loc[50, "len_at_pct"] == 50
    assert out.loc[75, "len_at_pct"] == 80
    assert out.loc[90, "len_at_pct"] == 90
    assert out.loc[99, "len_at_pct"] == 100
    assert (out["n_docs"] == 10).all()


def test_length_quantiles_engine_parity(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(60),
            "lang": ["en", "fr", "de"] * 20,
            "text": ["x"] * 60,
            "n_chars": [(i * 37) % 101 for i in range(60)],
        }
    )
    key = ["lang", "pct"]
    got = (
        ta.length_quantiles(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    con = _con(pdf)
    exp = (
        con.sql(ta.duckdb_length_quantiles_sql())
        .df()
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in ("pct", "n_docs", "len_at_pct")}),
        exp.astype({c: "int64" for c in ("pct", "n_docs", "len_at_pct")}),
    )


# ------------------------------------------------------------------ BM25
def test_bm25_hand_arithmetic(spark):
    """Pin the integer BM25 formula on a 3-doc corpus where every
    quantity is small enough to verify by hand."""
    import math

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "spark join join filter",   # dl=4
                "spark merge sort",         # dl=3
                "window window sort slow",  # dl=4
            ],
        }
    )
    out = retrieval.bm25_topk(spark.createDataFrame(pdf)).toPandas()
    n_docs, total = 3, 11

    def idf_milli(df):
        return math.floor(
            1000.0 * (math.log2(2 * n_docs + 2) - math.log2(2 * df + 1))
        )

    def contrib(df, tf, dl):
        return (idf_milli(df) * 22 * total * tf) // (
            10 * total * tf + 3 * total + 9 * n_docs * dl
        )

    # q_join = "spark join filter" on doc 1: spark df=2 tf=1,
    # join df=1 tf=2, filter df=1 tf=1, dl=4
    expect_d1 = (
        contrib(2, 1, 4) + contrib(1, 2, 4) + contrib(1, 1, 4)
    )
    row = out[(out["query"] == "q_join") & (out["doc_id"] == 1)].iloc[0]
    assert int(row["score_milli"]) == expect_d1
    assert int(row["n_hit_terms"]) == 3
    assert int(row["rank"]) == 1  # only doc 1 has join+filter
    # q_sort: doc 2 (merge+sort) must outrank doc 3 (sort+window):
    # both match 2 terms but merge (df=1) is rarer than window's
    # second hit; verify the full ordering instead of eyeballing
    q_sort = out[out["query"] == "q_sort"].sort_values("rank")
    d2 = contrib(2, 1, 3) + contrib(1, 1, 3)          # sort + merge
    d3 = contrib(2, 1, 4) + contrib(1, 2, 4)          # sort + window(tf=2)
    exp_order = [2, 3] if d2 > d3 else [3, 2]
    assert list(q_sort["doc_id"]) == exp_order
    assert list(q_sort["score_milli"]) == sorted([d2, d3], reverse=True)


def test_bm25_engine_parity(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(30)),
            "text": [
                f"spark join filter merge sort window slow customer "
                f"scan batch tok{i % 5} " + "join " * (i % 4)
                for i in range(30)
            ],
        }
    )
    got = (
        retrieval.bm25_topk(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values(["query", "rank"])
        .reset_index(drop=True)
    )
    con = _con(pdf)
    exp = (
        con.sql(retrieval.duckdb_bm25_sql())
        .df()
        .sort_values(["query", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) == 15
    for col in ["query", "rank", "doc_id", "n_hit_terms", "score_milli"]:
        assert list(got[col]) == list(exp[col]), col


# --------------------------------- histogram quantiles (the 100-TB path)
def test_hist_quantiles_bracket_exact(spark):
    """The histogram bucket must CONTAIN the exact nearest-rank value
    for every (lang, pct) — the approximation contract — and match the
    DuckDB twin row-for-row."""
    import numpy as np

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "doc_id": range(200),
            "text": ["x"] * 200,
            "lang": [["en", "de", "fr"][i % 3] for i in range(200)],
            "source": ["s"] * 200,
            "n_chars": rng.integers(1, 900, size=200),
        }
    )
    sdf = spark.createDataFrame(pdf)
    exact = ta.length_quantiles(sdf).toPandas()
    hist = ta.length_quantiles_hist(sdf).toPandas()
    assert len(hist) == len(exact)
    m = exact.merge(hist, on=["lang", "pct", "n_docs"])
    assert len(m) == len(exact)
    assert (
        (m.bucket_lo <= m.len_at_pct) & (m.len_at_pct < m.bucket_hi_excl)
    ).all()
    con = _con(pdf)
    exp = (
        con.sql(ta.duckdb_length_quantiles_hist_sql())
        .df()
        .sort_values(["lang", "pct"])
        .reset_index(drop=True)
    )
    got = hist.sort_values(["lang", "pct"]).reset_index(drop=True)
    for col in ["lang", "pct", "n_docs", "bucket_lo", "bucket_hi_excl"]:
        assert list(got[col]) == list(exp[col]), col
