from __future__ import annotations

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
