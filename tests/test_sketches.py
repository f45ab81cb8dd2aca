from __future__ import annotations

import pandas as pd
import pytest

from easyocr_spark.operators import sketches as sk


def test_countmin_total_collision_at_width_one(spark):
    """w=1 forces every term into one cell: the estimate for each term
    is the whole token count — the pure-collision upper bound."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a b", "c"]})
    )
    out = sk.countmin_heavy_hitters(docs, d=1, w=1).toPandas()
    assert sorted(out.term) == ["a", "b", "c"]
    assert (out.exact_cnt == 1).all()
    assert (out.est_cnt == 3).all()
    assert (out.overcount == 2).all()


def test_countmin_upper_bound_and_topk(spark):
    """est_cnt >= exact_cnt always (one-sided error); top-k keeps the
    k highest exact counts with (count desc, term asc) tiebreak."""
    texts = ["x x x x y y z w v u t s r q p o n m l k".replace(" ", " ")]
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": texts}))
    out = sk.countmin_heavy_hitters(docs, d=2, w=4, k=3).toPandas()
    assert len(out) == 3
    assert (out.est_cnt >= out.exact_cnt).all()
    assert out.sort_values(
        ["exact_cnt", "term"], ascending=[False, True]
    ).term.tolist()[0] == "x"


def test_countmin_min_over_rows_tightens(spark):
    """With more rows the min-readout can only tighten: d=2 estimates
    are <= the d=1 estimates for every term (same bases prefix)."""
    txt = " ".join(f"t{i}" for i in range(40))
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [txt]}))
    e1 = (
        sk.countmin_heavy_hitters(docs, d=1, w=8, k=40)
        .toPandas()
        .set_index("term")
        .est_cnt
    )
    e2 = (
        sk.countmin_heavy_hitters(docs, d=2, w=8, k=40)
        .toPandas()
        .set_index("term")
        .est_cnt
    )
    assert (e2[e1.index] <= e1).all()
    assert (e2 < e1[e2.index]).any()  # at least one term actually tightened


def test_bloom_no_false_negatives_and_copy_detected(spark):
    """member_exact=1 implies member_est=1 structurally (a member's
    positions are all in the filter by construction) — including a
    NON-reference doc whose text copies a reference doc's."""
    rows = [(i, f"unique text number {i} padding words") for i in range(20)]
    # doc 13 (13 % 10 = 3 -> NOT in the reference set) copies doc 2's text
    rows[13] = (13, rows[2][1])
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    out = sk.bloom_membership(docs).toPandas()
    assert len(out) == 20
    viol = out[(out.member_exact == 1) & (out.member_est == 0)]
    assert viol.empty
    d13 = out[out.doc_id == 13].iloc[0]
    assert d13.member_exact == 1 and d13.member_est == 1
    # reference docs are members of their own filter
    refs = out[out.doc_id % 10 < 3]
    assert (refs.member_exact == 1).all() and (refs.member_est == 1).all()


def test_bloom_false_positives_are_one_sided(spark):
    """With a deliberately tiny filter, false positives appear but
    never false negatives — the Bloom contract."""
    rows = [(i, f"doc {i} " + " ".join(f"w{i}{j}" for j in range(10)))
            for i in range(60)]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    out = sk.bloom_membership(docs, m=64, k=2).toPandas()
    assert (out.member_est >= out.member_exact).all()
    assert int(out.member_est.sum()) > int(out.member_exact.sum())
