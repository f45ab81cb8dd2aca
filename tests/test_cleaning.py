"""C4 line-level cleaning — rule semantics per augmentation class plus
DuckDB engine parity."""

from __future__ import annotations

import duckdb
import pandas as pd

from easyocr_spark.operators import cleaning


def _pdf(n=10):
    return pd.DataFrame(
        {
            "doc_id": list(range(n)),
            "text": [f"alpha beta gamma delta epsilon zeta{i}" for i in range(n)],
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": [30] * n,
        }
    )


def test_c4_rules_per_class(spark):
    out = (
        cleaning.c4_clean(spark.createDataFrame(_pdf()))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # class 0: brace line -> whole doc dropped, kept hash is md5('')
    assert out.loc[0, "doc_action"] == "drop_brace"
    assert out.loc[0, "n_kept"] == 0 and out.loc[0, "kept_md5"] == md5("")
    # class 1: base sentence + 'ok' (too short, dropped) + long sentence
    assert out.loc[1, "doc_action"] == "keep"
    assert out.loc[1, "n_lines"] == 3 and out.loc[1, "n_kept"] == 2
    assert out.loc[1, "kept_md5"] == md5(
        "alpha beta gamma delta epsilon zeta1.\n"
        "this additional sentence definitely has enough words here."
    )
    # class 2: javascript line dropped, base kept
    assert out.loc[2, "doc_action"] == "keep" and out.loc[2, "n_kept"] == 1
    # class 3: lorem ipsum -> doc dropped
    assert out.loc[3, "doc_action"] == "drop_lorem" and out.loc[3, "n_kept"] == 0
    # class 4: base line never gets terminal punctuation -> 0 kept lines
    assert out.loc[4, "doc_action"] == "keep"
    assert out.loc[4, "n_lines"] == 1 and out.loc[4, "n_kept"] == 0
    assert out.loc[4, "kept_md5"] == md5("")


def test_c4_engine_parity(spark):
    pdf = _pdf(25)
    got = (
        cleaning.c4_clean(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = (
        con.sql(cleaning.duckdb_c4_clean_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for col in ["doc_id", "doc_action", "n_lines", "n_kept", "kept_md5"]:
        assert list(got[col]) == list(exp[col]), col


# ------------------------------------------------- Gopher quality rules
def test_gopher_rules_per_class(spark):
    """One planted violation per augmentation class, checked against
    hand-computed milli ratios on a fixed 60-word base text."""
    base = " ".join(f"word{i}" for i in range(60))  # 60 words, all alpha
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [base] * 4,
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [len(base)] * 4,
        }
    )
    out = (
        cleaning.gopher_rules(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # class 0: stopwords injected -> full pass
    assert bool(out.loc[0, "gopher_keep"]) and out.loc[0, "first_fail"] == ""
    assert out.loc[0, "n_req_stop"] == 4  # that, have, with, to
    # class 1: 10 bullet lines of 11 total -> 909 milli > 900
    assert out.loc[1, "bullet_milli"] == 10 * 1000 // 11
    assert out.loc[1, "first_fail"] == "bullet_lines"
    # class 2: 2 of 3 lines end in ellipsis -> 666 > 300
    assert out.loc[2, "ellipsis_milli"] == 2000 // 3
    assert out.loc[2, "first_fail"] == "ellipsis_lines"
    # class 3: 15 hashes / 65 words = 230 milli > 100
    assert out.loc[3, "sym_milli"] == 15 * 1000 // 65
    assert out.loc[3, "first_fail"] == "symbol_ratio"
    assert not out.loc[[1, 2, 3], "gopher_keep"].any()


def test_gopher_short_doc_and_parity(spark):
    """Sub-50-word docs fail word_count FIRST (the paper's rule order);
    full-frame parity against the DuckDB twin."""
    pdf = pd.DataFrame(
        {
            "doc_id": range(16),
            "text": [
                " ".join(f"tok{j}" for j in range(10 + 7 * i))
                for i in range(16)
            ],
            "lang": ["en"] * 16,
            "source": ["s"] * 16,
            "n_chars": [0] * 16,
        }
    )
    got = (
        cleaning.gopher_rules(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    short = got[got.n_words < 50]
    assert len(short) and (short.first_fail == "word_count").all()
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = (
        con.sql(cleaning.duckdb_gopher_rules_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for col in got.columns:
        assert list(got[col]) == list(exp[col]), col


# ---------------------------------------------------- text normalization
def test_normalize_text_per_class(spark):
    """Each dirt class normalizes back to the clean original (the
    negative control is byte-identical and flags changed=False)."""
    import hashlib

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["alpha beta gamma"] * 4,
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [16] * 4,
        }
    )
    out = (
        cleaning.normalize_text(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # class 0: untouched
    assert not bool(out.loc[0, "changed"])
    assert out.loc[0, "n_removed_chars"] == 0
    # class 1: controls+tabs stripped -> 'trailing control alpha beta gamma'
    assert bool(out.loc[1, "changed"])
    assert out.loc[1, "norm_md5"] == hashlib.md5(
        b"trailing control alpha beta gamma"
    ).hexdigest()
    # class 2: zero-widths removed INSIDE the word -> 'zerowidthjoin'
    assert out.loc[2, "norm_md5"] == hashlib.md5(
        b"alpha beta gamma zerowidthjoin"
    ).hexdigest()
    assert out.loc[2, "n_removed_chars"] == 3
    # class 3: NBSP/ideographic spaces fold to ASCII space
    assert out.loc[3, "norm_md5"] == hashlib.md5(
        b"nb sp wide alpha beta gamma"
    ).hexdigest()


def test_normalize_text_engine_parity(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(20),
            "text": [f"tok{i} alpha beta" for i in range(20)],
            "lang": ["en"] * 20,
            "source": ["s"] * 20,
            "n_chars": [0] * 20,
        }
    )
    got = (
        cleaning.normalize_text(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = (
        con.sql(cleaning.duckdb_normalize_text_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for col in got.columns:
        assert list(got[col]) == list(exp[col]), col
