"""Bucketed (co-located) joins — the shuffle-free join path at scale.

At 100 TB the repeated join key of this engine is doc-grain (doc_id:
spans join back to extraction output, state tables, quality scores) and
media-grain (media_ref: OCR results join back to spans). Writing both
sides bucketed by the join key with the SAME bucket count makes every
subsequent join a ZERO-EXCHANGE sort-merge join: each task reads one
bucket file from each side, already co-partitioned — the shuffle that
normally dominates doc-grain joins disappears from every downstream
pipeline run. This is the parquet/warehouse analogue of Iceberg's
bucket partition transform (the production target's layout).

The demo contract is plan-verified in tests: with broadcast disabled,
the join of two tables written via ``write_bucketed`` must contain no
Exchange operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str = "doc_id",
    n_buckets: int = 8,
) -> None:
    """Write ``df`` as an external bucketed+sorted parquet table. The
    bucket count is the co-location contract: all tables meant to join
    on ``key`` must use the same count."""
    (
        df.write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "doc_id"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — plans as a
    sort-merge join with NO Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key)
