from __future__ import annotations

import duckdb
import pandas as pd

from easyocr_spark.operators import sharding


def _docs(spark, n=300):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(n), "text": ["x"] * n})
    )


def test_split_shards_shape_and_determinism(spark):
    out = sharding.train_split_shards(_docs(spark), shards=4).toPandas()
    assert len(out) == 300
    assert set(out["split"].unique()) <= {"train", "val", "test"}
    # 90/5/5-ish on 300 uniform hashes
    frac = (out["split"] == "train").mean()
    assert 0.8 < frac < 0.97
    assert set(out["shard"].unique()) <= set(range(4))
    # epoch_pos is a contiguous 1..n ordering within each (split, shard)
    for (_, _), g in out.groupby(["split", "shard"]):
        assert sorted(g["epoch_pos"]) == list(range(1, len(g) + 1))
    # rerun on a subset: assignments of surviving docs are unchanged
    sub = sharding.train_split_shards(_docs(spark, 150), shards=4).toPandas()
    merged = sub.merge(out, on="doc_id", suffixes=("_sub", "_full"))
    assert (merged["split_sub"] == merged["split_full"]).all()
    assert (merged["shard_sub"] == merged["shard_full"]).all()


def test_split_shards_engine_parity(spark):
    s = (
        sharding.train_split_shards(_docs(spark), shards=4)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": range(300)}))
    d = (
        con.sql(sharding.duckdb_split_shards_sql(shards=4))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        s.astype({"shard": "int64", "epoch_pos": "int64"}), d
    )


def test_shard_leakage_counts_cross_split_grams(spark):
    """A val doc (doc_id 8 under the LCG split rule) sharing a 12-token
    run with a train doc (doc_id 0) reports exactly the 3 contained
    10-gram windows leaked out of its 8 total (375 milli); a clean
    test doc (doc_id 7) reports zero."""
    shared = " ".join(f"s{i}" for i in range(12))
    pdf = pd.DataFrame({
        "doc_id": [0, 8, 7],
        "text": [
            shared + " " + " ".join(f"t{i}" for i in range(8)),   # train
            " ".join(f"v{i}" for i in range(5)) + " " + shared,   # val
            " ".join(f"u{i}" for i in range(15)),                 # test
        ],
    })
    res = sharding.shard_leakage(spark.createDataFrame(pdf), n=10)
    out = res.toPandas().set_index("split")
    res.unpersist()
    assert out.loc["val"].tolist() == [1, 8, 3, 375]
    assert out.loc["test"].tolist() == [1, 6, 0, 0]


# ------------------------------------------------ group-holdout split
def test_grouped_split_never_straddles(spark):
    """Every near-dup cluster lands in exactly one split; singletons
    draw the same split train_split_shards' rule would give their own
    id (group_key == doc_id)."""
    import pandas as pd

    from easyocr_spark.operators import dedup, sharding

    base = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [
                " ".join(f"w{(i * 11 + j) % 53}" for j in range(25))
                for i in range(40)
            ],
        }
    )
    aug = dedup.with_mutants(spark.createDataFrame(base))
    out = sharding.grouped_split(aug).toPandas()
    assert len(out) == aug.count()
    # clusters (n_members > 1) are single-split by construction
    clustered = out[out.n_members > 1]
    assert len(clustered) > 0, "mutants should form clusters"
    for gk, grp in clustered.groupby("group_key"):
        assert grp.split.nunique() == 1, gk
    # singletons: group_key is their own id
    singles = out[out.n_members == 1]
    assert (singles.group_key == singles.doc_id).all()
    assert set(out.split) <= {"train", "val", "test"}


def test_grouped_split_engine_parity(spark):
    import duckdb
    import pandas as pd

    from easyocr_spark.operators import dedup, sharding

    base = pd.DataFrame(
        {
            "doc_id": range(30),
            "text": [
                " ".join(f"w{(i * 7 + j) % 41}" for j in range(20))
                for i in range(30)
            ],
        }
    )
    aug = dedup.with_mutants(spark.createDataFrame(base))
    got = (
        sharding.grouped_split(aug)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", base)
    exp = (
        con.sql(
            sharding.duckdb_grouped_split_sql(
                dedup.duckdb_with_mutants_sql()
            )
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for col in ["doc_id", "group_key", "n_members", "split"]:
        assert list(got[col]) == list(exp[col]), col
