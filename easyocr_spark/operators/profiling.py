"""Deequ-style table profiling: per-column completeness, distinctness
and range in ONE declarative pass — the data-validation step a training
pipeline runs over every ingested table before spending GPU-hours on it
(the open-source references are AWS Deequ / Great Expectations; this is
the exact-arithmetic Spark-first shape).

Design:
- The table UNPIVOTS to (column, value) rows via a single `stack`
  Generate — k x n rows for k profiled columns, still one scan of the
  source — then one map-side-combining aggregation per column computes
  n_rows / n_null / n_distinct / min / max. `count(DISTINCT value)`
  within a grouped agg is exact and per-group (no global expand: the
  group IS the column name, so each group's distinct set is
  independent).
- Numeric columns are rendered as zero-padded fixed-width decimals
  (lpad to 20) before the unpivot, making lexicographic min/max EQUAL
  numeric min/max for the non-negative domains of this corpus — one
  string comparator for every column, identical in DuckDB, no
  float/order divergence. The padding contract is part of the output
  (min_repr/max_repr are the padded forms).
- Scale: one shuffle keyed by column name — k groups. Distinct-heavy
  columns (doc_id: n distinct values) make their group's hash set
  large; at 100 TB you would split high-cardinality columns into their
  own approx pass (HLL sketch, the events_distinct_hll machinery) —
  documented here, exact contract kept for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAD = 20

DOC_NUMERIC = ("doc_id", "n_chars")
DOC_STRINGS = ("text", "lang", "source")


def profile_documents(docs: DataFrame) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_repr, max_repr) for the
    documents table's five columns; numerics zero-padded to width 20 so
    one string comparator serves every column."""
    cells = []
    for c in DOC_NUMERIC:
        cells.append(f"'{c}', lpad(cast(`{c}` as string), {PAD}, '0')")
    for c in DOC_STRINGS:
        cells.append(f"'{c}', `{c}`")
    k = len(cells)
    stacked = docs.select(
        F.expr(f"stack({k}, {', '.join(cells)})").alias("column", "value")
    )
    return (
        stacked.groupBy("column")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null"),
            F.countDistinct("value").alias("n_distinct"),
            F.min("value").alias("min_repr"),
            F.max("value").alias("max_repr"),
        )
    )


def duckdb_profile_sql(table: str = "documents") -> str:
    parts = []
    for c in DOC_NUMERIC:
        parts.append(
            f"SELECT '{c}' AS \"column\", lpad(CAST({c} AS VARCHAR), {PAD}, '0')"
            f" AS value FROM {table}"
        )
    for c in DOC_STRINGS:
        parts.append(f"SELECT '{c}' AS \"column\", {c} AS value FROM {table}")
    unioned = "\n      UNION ALL\n      ".join(parts)
    return f"""
    WITH cells AS (
      {unioned}
    )
    SELECT "column",
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(count(DISTINCT value) AS BIGINT) AS n_distinct,
           min(value) AS min_repr,
           max(value) AS max_repr
    FROM cells
    GROUP BY 1
    """
