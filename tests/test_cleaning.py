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
