from __future__ import annotations

import duckdb
import pandas as pd

from easyocr_spark.operators import mixing


def _docs(spark, strata: dict[tuple[str, str], int]):
    rows = []
    i = 0
    for (src, lg), n in strata.items():
        for _ in range(n):
            rows.append(
                {"doc_id": i, "text": "t", "lang": lg, "source": src, "n_chars": 1}
            )
            i += 1
    return spark.createDataFrame(pd.DataFrame(rows))


def test_sqrt_temperature_flattens(spark):
    """n = 1/4/9 -> sqrt weights 1/2/3: the rare stratum's temp share
    (1/6) beats its raw share (1/14) and the dominant one flattens
    (3/6 < 9/14); boosts land on the right side of 1000 milli."""
    docs = _docs(
        spark, {("a", "en"): 1, ("b", "en"): 4, ("c", "en"): 9}
    )
    out = mixing.corpus_mix(docs).toPandas().set_index("source")
    assert out.loc["a", "raw_ppm"] == 1_000_000 * 1 // 14
    assert out.loc["a", "temp_ppm"] == 1_000_000 * 1 // 6
    assert out.loc["c", "temp_ppm"] == 1_000_000 * 3 // 6
    assert out.loc["a", "boost_milli"] > 1000  # upweighted
    assert out.loc["c", "boost_milli"] < 1000  # flattened
    assert out.loc["b", "n_chars"] == 4


def test_shares_sum_to_one_up_to_floor(spark):
    docs = _docs(
        spark,
        {("a", "en"): 3, ("a", "de"): 5, ("b", "en"): 7, ("c", "zh"): 2},
    )
    out = mixing.corpus_mix(docs).toPandas()
    for col in ("raw_ppm", "temp_ppm"):
        assert 1_000_000 - len(out) <= out[col].sum() <= 1_000_000


def test_single_stratum_identity(spark):
    out = mixing.corpus_mix(_docs(spark, {("a", "en"): 5})).toPandas()
    assert out.raw_ppm.tolist() == [1_000_000]
    assert out.temp_ppm.tolist() == [1_000_000]
    assert out.boost_milli.tolist() == [1000]


def _dsir_docs() -> pd.DataFrame:
    target = "alpha beta gamma delta alpha beta"
    rawvoc = "zeta eta theta iota kappa zeta"
    rows = [
        {"doc_id": i, "text": target, "lang": "en", "source": "src1", "n_chars": 1}
        for i in range(6)
    ]
    rows += [
        {"doc_id": 10 + i, "text": rawvoc, "lang": "en", "source": "src9", "n_chars": 1}
        for i in range(5)
    ]
    # one RAW doc written in the target vocabulary — the doc DSIR exists
    # to rescue from the raw pool
    rows.append(
        {"doc_id": 99, "text": target, "lang": "en", "source": "src9", "n_chars": 1}
    )
    return pd.DataFrame(rows)


def test_dsir_directionality(spark):
    """A raw-pool doc written in the target vocabulary scores positive
    (keep=1) and above every raw-vocabulary doc; raw-vocabulary docs
    score negative (their buckets have n_t=0, so the smoothed ratio is
    -log2(n_r+1) < 0)."""
    out = (
        mixing.dsir_importance(spark.createDataFrame(_dsir_docs()))
        .toPandas()
        .set_index("doc_id")
    )
    assert len(out) == 12
    assert out.loc[99, "keep"] == 1
    for i in range(5):
        assert out.loc[10 + i, "keep"] == 0
        assert out.loc[99, "weight_milli"] > out.loc[10 + i, "weight_milli"]


def test_dsir_engine_parity(spark):
    pdf = _dsir_docs()
    s = (
        mixing.dsir_importance(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    d = (
        con.sql(mixing.duckdb_dsir_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(s.astype("int64"), d.astype("int64"))


# ------------------------------------------------------------ UniMax
def test_unimax_waterfill_hand_case(spark):
    """Skewed 3-lang corpus where the small language binds at its
    1-epoch cap and the freed budget flows to the big ones."""
    import pandas as pd

    # tokens per doc = word count; lang zz: 4 tokens, en: 40, de: 40
    pdf = pd.DataFrame(
        {
            "doc_id": range(9),
            "text": (["tiny lang doc four"] * 1)
            + [" ".join(f"w{j}" for j in range(10))] * 8,
            "lang": ["zz"] + ["en"] * 4 + ["de"] * 4,
            "source": ["s"] * 9,
            "n_chars": [0] * 9,
        }
    )
    out = (
        mixing.unimax_mix(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("lang")
    )
    # total = 84, budget = 42; ascending order: zz(4), de(40), en(40)
    # zz: min(4, 42//3=14) = 4 capped; de: min(40, 38//2=19) = 19;
    # en: min(40, 19//1) = 19
    assert out.loc["zz", "alloc_tokens"] == 4 and bool(out.loc["zz", "capped"])
    assert out.loc["de", "alloc_tokens"] == 19 and not bool(out.loc["de", "capped"])
    assert out.loc["en", "alloc_tokens"] == 19
    assert out.loc["zz", "epochs_milli"] == 1000
    assert int(out.alloc_tokens.sum()) <= 42


def test_unimax_engine_parity(spark):
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": range(30),
            "text": [
                " ".join(f"w{j}" for j in range(3 + (i * 13) % 17))
                for i in range(30)
            ],
            "lang": [["en", "de", "fr", "zz"][i % 4] for i in range(30)],
            "source": ["s"] * 30,
            "n_chars": [0] * 30,
        }
    )
    got = (
        mixing.unimax_mix(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = (
        con.sql(mixing.duckdb_unimax_sql())
        .df()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    for col in got.columns:
        assert list(got[col]) == list(exp[col]), col
