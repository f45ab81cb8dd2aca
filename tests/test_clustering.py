from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from easyocr_spark.operators import clustering as cl
from easyocr_spark.operators.similarity import DIM


def _emb_df(spark, vecs: dict[int, np.ndarray]):
    rows = pd.DataFrame(
        {
            "vec_id": list(vecs),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs.values()],
            "label": [0] * len(vecs),
        }
    )
    return spark.createDataFrame(rows)


def _two_blob_vecs():
    """Blob A on axis 0 (ids 0-19, incl. init id 3), blob B on axis 1
    (ids 20-45, incl. init id 28); per-id jitter so centroids actually
    move during updates."""
    vecs = {}
    for i in range(46):
        v = np.zeros(DIM, dtype=np.float32)
        axis = 0 if i < 20 else 1
        v[axis] = 1.0 + i * 0.001
        vecs[i] = v
    return vecs


def test_two_blobs_separate_exactly(spark):
    out = (
        cl.kmeans_clusters(_emb_df(spark, _two_blob_vecs()), k=2, iters=2)
        .toPandas()
        .set_index("vec_id")
    )
    assert (out.loc[:19, "cluster"] == 0).all()
    assert (out.loc[20:, "cluster"] == 1).all()
    # converged centroids are blob means: winning dist2 is small vs the
    # cross-blob distance (~2e12 in squared micros)
    assert out.dist2.max() < 10**9


def test_tiebreak_and_empty_cluster_keep_rule(spark):
    """Identical vectors at ids 3/28/53: both init centroids coincide,
    every point ties -> all to cluster 0; cluster 1 goes empty and must
    keep its previous centroid (no crash, stable k rows of state)."""
    v = np.full(DIM, 0.5, dtype=np.float32)
    out = (
        cl.kmeans_clusters(
            _emb_df(spark, {3: v, 28: v, 53: v}), k=2, iters=2
        )
        .toPandas()
        .set_index("vec_id")
    )
    assert (out.cluster == 0).all()
    assert (out.dist2 == 0).all()


def test_init_rule_underflow_raises(spark):
    v = np.zeros(DIM, dtype=np.float32)
    with pytest.raises(ValueError, match="init rule"):
        cl.kmeans_clusters(_emb_df(spark, {3: v, 4: v}), k=2, iters=1)


def test_final_plan_is_narrow(spark):
    """The returned assignment DataFrame is a pure map-side projection:
    centroids ride as literals, so the plan has no Exchange at all."""
    df = cl.kmeans_clusters(_emb_df(spark, _two_blob_vecs()), k=2, iters=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_engine_parity_parameterized(spark):
    """Spark and DuckDB agree row-for-row at non-default (k, iters) on
    the blob corpus — the parameterized twin, not just the registered
    defaults."""
    vecs = _two_blob_vecs()
    spark_out = (
        cl.kmeans_clusters(_emb_df(spark, vecs), k=2, iters=2)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    pdf = pd.DataFrame(
        {
            "vec_id": list(vecs),
            "embedding": [list(map(float, v)) for v in vecs.values()],
        }
    )
    con.register("embeddings", pdf)
    duck_out = (
        con.sql(cl.duckdb_kmeans_sql(k=2, iters=2))
        .df()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_out.astype("int64"), duck_out.astype("int64")
    )


def _semdedup_vecs():
    """Two blobs plus exact copies: id 100 copies id 5 (blob A), id 101
    copies id 28 (blob B, the init id), id 102 copies id 5 again — a
    3-member duplicate neighborhood and a 2-member one, in different
    clusters."""
    vecs = _two_blob_vecs()
    vecs[100] = vecs[5]
    vecs[101] = vecs[28]
    vecs[102] = vecs[5]
    return vecs


def test_semantic_dedup_finds_planted_copies(spark):
    out = (
        cl.semantic_dedup_pairs(_emb_df(spark, _semdedup_vecs()), k=2, iters=2)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    # exact copies co-cluster always -> every planted pair found at
    # cos_micro == 1_000_000 (the single-axis blob vectors are all
    # PARALLEL, so non-copy within-blob pairs also hit 1.0 — the blob
    # corpus exercises the drop rule's dist2 branch on those)
    pairs = set(zip(out.id_a, out.id_b))
    planted = {(5, 100), (5, 102), (100, 102), (28, 101)}
    assert planted <= pairs
    by_pair = out.set_index(["id_a", "id_b"])
    for p in planted:
        r = by_pair.loc[p]
        assert r.cos_micro == 1_000_000
        # identical vectors -> equal dist2 -> tie drops the larger id
        assert r.drop_id == max(p)
    # drop_id is always one of the pair, and pairs are ordered
    assert out.apply(
        lambda r: r.drop_id in (r.id_a, r.id_b), axis=1
    ).all()
    assert (out.id_a < out.id_b).all()


def test_semantic_dedup_engine_parity(spark):
    vecs = _semdedup_vecs()
    spark_out = (
        cl.semantic_dedup_pairs(_emb_df(spark, vecs), k=2, iters=2)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    pdf = pd.DataFrame(
        {
            "vec_id": list(vecs),
            "embedding": [list(map(float, v)) for v in vecs.values()],
        }
    )
    con.register("embeddings", pdf)
    duck_out = (
        con.sql(cl.duckdb_semdedup_sql(k=2, iters=2))
        .df()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_out.astype("int64"), duck_out.astype("int64")
    )
