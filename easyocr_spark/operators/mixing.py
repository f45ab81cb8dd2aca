"""Temperature-based corpus mixing weights (the training-mix table).

LLM training runs don't sample sources uniformly: the standard recipe
(GPT-3 / Pile / LLaMA style) draws stratum i with probability
proportional to n_i^alpha for alpha < 1, upweighting rare sources and
flattening dominant ones. This operator emits that mixing table for the
(source, lang) strata of the corpus: raw share, temperature-adjusted
share, and the per-document oversampling boost the sampler must apply.

alpha is fixed at 0.5 because IEEE-754 `sqrt` is correctly rounded and
therefore bit-identical across Spark's JVM and DuckDB — a general
`pow(n, alpha)` is NOT correctly rounded and may differ in the last ulp
between libm implementations, which would break the bit-exact oracle.
All shares are integer ppm via floor(double division); numerators stay
exact int64 (n_i * 1e6 needs n_i < 9.2e12 per stratum — beyond that the
double rounds, identically in both engines, losing only sub-ppm
precision).

Scale shape: ONE map-side-combining shuffle (the stratum aggregation);
the normalization runs on the aggregated stratum table, whose row count
is bounded by |sources| x |langs| by construction, so the unpartitioned
window that computes the totals touches a bounded single partition —
not a data-scale shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def corpus_mix(docs: DataFrame) -> DataFrame:
    """Per-(source, lang) mixing table: (source, lang, n_docs, n_chars,
    raw_ppm, temp_ppm, boost_milli). boost_milli is NULL for strata too
    small to register a single raw ppm (possible at 1e12 docs)."""
    agg = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    sq = F.floor(F.sqrt(F.col("n_docs").cast("double")) * F.lit(float(PPM))).cast(
        "long"
    )
    strata = agg.select("source", "lang", "n_docs", "n_chars", sq.alias("sq"))
    w = Window.partitionBy()  # bounded: one row per stratum
    raw_ppm = F.floor(
        (F.col("n_docs") * F.lit(PPM)).cast("double") / F.sum("n_docs").over(w)
    ).cast("long")
    temp_ppm = F.floor(
        (F.col("sq") * F.lit(PPM)).cast("double") / F.sum("sq").over(w)
    ).cast("long")
    shared = strata.select(
        "source",
        "lang",
        "n_docs",
        "n_chars",
        raw_ppm.alias("raw_ppm"),
        temp_ppm.alias("temp_ppm"),
    )
    boost = F.when(
        F.col("raw_ppm") > 0,
        F.floor(
            (F.col("temp_ppm") * F.lit(1000)).cast("double") / F.col("raw_ppm")
        ).cast("long"),
    )
    return shared.select(
        "source",
        "lang",
        "n_docs",
        "n_chars",
        "raw_ppm",
        "temp_ppm",
        boost.alias("boost_milli"),
    )


def duckdb_mix_sql(table: str = "documents") -> str:
    return f"""
    WITH agg AS (
      SELECT source, lang,
             count(*) AS n_docs,
             sum(n_chars) AS n_chars
      FROM {table}
      GROUP BY source, lang
    ),
    strata AS (
      SELECT source, lang, n_docs, n_chars,
             CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * {PPM}.0) AS BIGINT) AS sq
      FROM agg
    ),
    shared AS (
      SELECT source, lang, n_docs, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(floor(CAST(n_docs * {PPM} AS DOUBLE)
                        / sum(n_docs) OVER ()) AS BIGINT) AS raw_ppm,
             CAST(floor(CAST(sq * {PPM} AS DOUBLE)
                        / sum(sq) OVER ()) AS BIGINT) AS temp_ppm
      FROM strata
    )
    SELECT source, lang, n_docs, n_chars, raw_ppm, temp_ppm,
           CASE WHEN raw_ppm > 0
                THEN CAST(floor(CAST(temp_ppm * 1000 AS DOUBLE) / raw_ppm) AS BIGINT)
           END AS boost_milli
    FROM shared
    """
