"""Event operator unit tests with hand-built fixtures."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from easyocr_spark.operators import events


def ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # user 1: view @10:00, click @10:05, click @10:06, view @10:40 (new session), click @10:41
        (1, ts(0), 1, "view", 1.0),
        (2, ts(5), 1, "click", 2.0),
        (3, ts(6), 1, "click", 3.0),
        (4, ts(40), 1, "view", 4.0),
        (5, ts(41), 1, "click", 5.0),
        # user 2: click with no prior view
        (6, ts(10), 2, "click", 1.5),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    return spark.createDataFrame(pdf)


def test_sessionize_gap(ev):
    out = events.sessionize(ev, gap_minutes=30).toPandas()
    u1 = out[out.user_id == 1].sort_values("session_id")
    assert len(u1) == 2
    assert u1.iloc[0]["n_events"] == 3
    assert u1.iloc[1]["n_events"] == 2


def test_asof_prior_event(ev):
    out = events.asof_prior_event(ev).toPandas().set_index("event_id")
    base = int(dt.datetime(2024, 1, 1, 10, 0).timestamp() * 1000)
    assert out.loc[2]["prior_view_ms"] == base
    assert out.loc[3]["prior_view_ms"] == base
    assert out.loc[5]["prior_view_ms"] == base + 40 * 60000
    assert out.loc[6]["prior_view_ms"] == -1


def test_windowed_counts(ev):
    out = events.windowed_counts(ev, minutes=5).toPandas()
    w0 = out[(out.window_start_s == out.window_start_s.min())]
    assert w0.n.sum() == 1  # only the 10:00 view in the first window


def test_top_event_types(ev):
    out = events.top_event_types(ev, k=1).toPandas()
    u1 = out[out.user_id == 1]
    assert len(u1) == 1 and u1.iloc[0]["event_type"] == "click"


def test_hll_distinct_matches_duckdb_and_is_accurate(spark):
    """The portable HLL sketch must be BIT-IDENTICAL across engines
    (pure integer arithmetic) and within ~3 sigma (sigma = 1.04/sqrt(m)
    ~ 4.6% at m=512) of the exact distinct count across cardinality
    regimes, including the linear-counting small range."""
    import duckdb
    import pandas as pd

    from easyocr_spark.operators import events as E

    rows = []
    # three regimes: tiny (linear counting), mid, large
    for et, n_users in [("tiny", 30), ("mid", 700), ("big", 20000)]:
        for u in range(n_users):
            rows.append((len(rows), u * 7 + 1, et, 1.0))
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "value"])
    ev = spark.createDataFrame(pdf)
    got = (
        E.distinct_users_hll(ev)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", pdf)
    want = (
        con.execute(E.duckdb_distinct_hll_sql())
        .fetchdf()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert got.astype("int64", errors="ignore").equals(
        want[got.columns].astype(got.dtypes.to_dict())
    )
    for _, r in got.iterrows():
        rel = abs(r.est_distinct - r.exact_distinct) / r.exact_distinct
        assert rel < 0.15, (r.event_type, r.est_distinct, r.exact_distinct)
