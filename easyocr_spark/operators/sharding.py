"""Deterministic train/val/test split + epoch-shard assignment — the
"global shuffle" end of a training-data pipeline.

A trillion-doc corpus can't be shuffled by sorting on a random()
column (non-reproducible, and a full global sort): the standard
web-scale recipe is HASH ordering — derive per-doc pseudo-random keys
from the stable doc_id, split by residue, shard by a second key, and
order within each shard by a third. Re-running the job on any subset
of the corpus yields the same assignment for every doc (no RNG state,
no seed file), which is what makes training restarts and incremental
corpus refreshes reproducible.

Spark shape: the split and shard columns are a narrow, shuffle-free
codegen projection; the only shuffle is the per-shard epoch ordering
(`row_number` over (split, shard)) — `2 * SHARDS` independent sort
partitions, so parallelism scales with the shard count (shards scale
with the cluster; a shard is the unit a data-loader worker consumes).
The LCG keys reuse `text_analysis.stratified_sample`'s proven
engine-portable int64 arithmetic — doc_id * mult + inc mod 2^31-1 stays
exact in both engines (|doc_id| < ~4e9 at any SF keeps the product
under 2^63).

Split rule: lcg1 % 100 -> <90 train, <95 val, else test (the
conventional 90/5/5). Output: (doc_id, split, shard, epoch_pos) with
epoch_pos a contiguous 1..n_shard ordering within each (split, shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from easyocr_spark.operators.text_analysis import SAMPLE_MOD

SHARDS = 8
S_MULT_1, S_INC_1 = 1103515245, 54321  # split key
S_MULT_2, S_INC_2 = 69069, 36_2437    # shard key
S_MULT_3, S_INC_3 = 214013, 2531011   # epoch-order key
TRAIN_PCT, VAL_PCT = 90, 95


def _lcg(mult: int, inc: int):
    return (F.col("doc_id") * F.lit(mult) + F.lit(inc)) % F.lit(SAMPLE_MOD)


def train_split_shards(docs: DataFrame, shards: int = SHARDS) -> DataFrame:
    b = _lcg(S_MULT_1, S_INC_1) % 100
    split = (
        F.when(b < TRAIN_PCT, F.lit("train"))
        .when(b < VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    staged = docs.select(
        "doc_id",
        split.alias("split"),
        (_lcg(S_MULT_2, S_INC_2) % shards).alias("shard"),
        _lcg(S_MULT_3, S_INC_3).alias("ek"),
    )
    w = Window.partitionBy("split", "shard").orderBy("ek", "doc_id")
    return staged.select(
        "doc_id",
        "split",
        "shard",
        F.row_number().over(w).cast("long").alias("epoch_pos"),
    )


def duckdb_split_shards_sql(table: str = "documents", shards: int = SHARDS) -> str:
    def lcg(mult: int, inc: int) -> str:
        return f"((doc_id * {mult} + {inc}) % {SAMPLE_MOD})"

    return f"""
    WITH staged AS (
      SELECT doc_id,
             CASE WHEN {lcg(S_MULT_1, S_INC_1)} % 100 < {TRAIN_PCT} THEN 'train'
                  WHEN {lcg(S_MULT_1, S_INC_1)} % 100 < {VAL_PCT} THEN 'val'
                  ELSE 'test' END AS split,
             {lcg(S_MULT_2, S_INC_2)} % {shards} AS shard,
             {lcg(S_MULT_3, S_INC_3)} AS ek
      FROM {table}
    )
    SELECT doc_id, split, shard,
           row_number() OVER (PARTITION BY split, shard
                              ORDER BY ek, doc_id)::BIGINT AS epoch_pos
    FROM staged
    """
