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


def _labeled_emb_df(spark):
    """Label 0: tight blob on axis 0 + ONE far outlier (id 9, axis 2);
    label 1: tight blob on axis 1; label 2: two identical vectors (the
    degenerate mean-0 stratum that must flag nothing)."""
    vecs, labels = {}, {}
    for i in range(8):
        v = np.zeros(DIM, dtype=np.float32)
        v[0] = 1.0 + i * 0.001
        vecs[i], labels[i] = v, 0
    out = np.zeros(DIM, dtype=np.float32)
    out[2] = 5.0
    vecs[9], labels[9] = out, 0
    # genuinely tight: two values symmetric around the mean, so every
    # member sits at ~1x the stratum mean dist2 (a uniform LINE would
    # put its endpoints at ~3x mean — correctly flagged, wrong fixture)
    for i in range(20, 26):
        v = np.zeros(DIM, dtype=np.float32)
        v[1] = 2.0 + (i % 2) * 0.001
        vecs[i], labels[i] = v, 1
    same = np.full(DIM, 0.25, dtype=np.float32)
    vecs[40], labels[40] = same, 2
    vecs[41], labels[41] = same, 2
    return pd.DataFrame(
        {
            "vec_id": list(vecs),
            "embedding": [vecs[k] for k in vecs],
            "label": [labels[k] for k in vecs],
        }
    )


def test_embedding_outliers_flags_far_vector_only(spark):
    pdf = _labeled_emb_df(spark)
    out = (
        cl.embedding_outliers(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("vec_id")
    )
    assert len(out) == len(pdf)
    # the planted far vector is the only flagged one in label 0
    assert out.loc[9, "is_outlier"] == 1
    assert out[out.label == 0].is_outlier.sum() == 1
    # the tight blob of label 1 flags nothing
    assert out[out.label == 1].is_outlier.sum() == 0
    # degenerate stratum: mean 0, ratio 0, no flags
    assert (out[out.label == 2].mean_d2 == 0).all()
    assert (out[out.label == 2].ratio_milli == 0).all()
    assert out[out.label == 2].is_outlier.sum() == 0


def test_embedding_outliers_engine_parity(spark):
    pdf = _labeled_emb_df(spark)
    s = (
        cl.embedding_outliers(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("embeddings", pdf)
    d = (
        con.sql(cl.duckdb_embedding_outliers_sql())
        .df()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(s.astype("int64"), d.astype("int64"))


# ---------------------------------------------------- k-means inertia
def test_kmeans_inertia_sums_assignments(spark):
    """The k-row inertia table must agree with the assignment table it
    composes: per-cluster count and exact dist2 sum, floor-div mean."""
    from easyocr_spark.operators import clustering

    vecs = _two_blob_vecs()
    emb_table = _emb_df(spark, vecs)
    assigned = clustering.kmeans_clusters(emb_table, k=2, iters=2).toPandas()
    out = clustering.kmeans_inertia(emb_table, k=2, iters=2).toPandas()
    assert set(out.cluster) == set(assigned.cluster)
    for cl, grp in assigned.groupby("cluster"):
        row = out[out.cluster == cl].iloc[0]
        assert int(row.n_members) == len(grp)
        total = int(grp.dist2.astype("int64").astype(object).sum())
        assert int(row.inertia) == total
        assert int(row.mean_inertia) == total // len(grp)


def test_kmeans_inertia_engine_parity(spark):
    import duckdb

    from easyocr_spark.operators import clustering

    vecs = _two_blob_vecs()
    got = (
        clustering.kmeans_inertia(_emb_df(spark, vecs), k=2, iters=2)
        .toPandas()
        .sort_values("cluster")
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
    exp = (
        con.sql(clustering.duckdb_kmeans_inertia_sql(k=2, iters=2))
        .df()
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    for col in ["cluster", "n_members", "inertia", "mean_inertia"]:
        assert list(got[col]) == list(exp[col]), col


def test_assign_matches_reference_at_large_k(spark):
    """Focused internals test for the round-6 assignment rewrite (one
    SQL-parsed nested HOF over a k x DIM literal instead of k unrolled
    fold columns): at k=64 — the regime the old shape's codegen blew up
    in — every (cluster, dist2) must equal a straightforward Python
    reference using the same exact int64 arithmetic and the
    first-minimum (smallest cluster id) tie-break."""
    from pyspark.sql import functions as F

    rng = np.random.RandomState(7)
    vecs = {
        i: rng.uniform(-2, 2, size=DIM).astype(np.float32)
        for i in range(200)
    }
    mdf = _emb_df(spark, vecs).select(
        "vec_id", cl._micros(F.col("embedding")).alias("m")
    )
    micros = {
        r["vec_id"]: list(r["m"]) for r in mdf.collect()
    }
    cents = [micros[i] for i in range(64)]
    out = (
        cl._assign(mdf, cents)
        .select("vec_id", "cluster", "dist2")
        .toPandas()
        .set_index("vec_id")
    )
    for vid, m in micros.items():
        dists = [
            sum((a - b) * (a - b) for a, b in zip(m, c)) for c in cents
        ]
        best = min(dists)
        want = dists.index(best)  # first minimum = smallest cluster id
        assert out.loc[vid, "cluster"] == want, vid
        assert out.loc[vid, "dist2"] == best, vid
