from __future__ import annotations

import duckdb
import pandas as pd

from easyocr_spark.operators import profiling


def _pdf():
    return pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 10],
            "text": ["aa bb", "aa bb", None, "zz"],
            "lang": ["en", "en", "de", "de"],
            "source": ["s1", "s2", "s2", "s2"],
            "n_chars": [5, 5, 0, 2],
        }
    )


def test_profile_counts_nulls_and_padded_range(spark):
    out = (
        profiling.profile_documents(spark.createDataFrame(_pdf()))
        .toPandas()
        .set_index("column")
    )
    assert len(out) == 5
    assert (out.n_rows == 4).all()
    assert out.loc["text", "n_null"] == 1
    assert out.loc["text", "n_distinct"] == 2  # nulls excluded
    assert out.loc["lang", "n_distinct"] == 2
    # zero-padding makes lexicographic == numeric: doc_id max is 10,
    # which plain string ordering would rank below "2"
    assert out.loc["doc_id", "max_repr"] == "0" * 18 + "10"
    assert out.loc["n_chars", "min_repr"].lstrip("0") in ("", "0")


def test_profile_engine_parity(spark):
    pdf = _pdf()
    s = (
        profiling.profile_documents(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("column")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    d = (
        con.sql(profiling.duckdb_profile_sql())
        .df()
        .sort_values("column")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        s.astype({"n_rows": "int64", "n_null": "int64", "n_distinct": "int64"}),
        d,
    )
