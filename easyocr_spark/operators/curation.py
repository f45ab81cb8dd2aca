"""Corpus curation manifest — the training-data pipeline's END PRODUCT.

Every upstream signal this engine computes individually (near-dup
keep-list, benchmark contamination, heuristic quality, repetition)
feeds ONE per-document keep/drop decision with an auditable reason —
the table a data curator actually materializes before tokenization
(the Dolma/RefinedWeb "mixer" shape: filters as composable rules over
precomputed attributes).

Rule order is fixed and first-match-wins, so every drop is explained
by exactly one reason:

1. ``eval_holdout``  — the deterministic eval split
   (doc_id % EVAL_MOD == EVAL_RES) never enters training data.
2. ``duplicate``     — not the canonical member of its near-dup
   component (dedup.dedup_keeplist).
3. ``contaminated``  — shares >= 1 n-gram with the eval split
   (dedup.decontaminate).
4. ``too_short`` / ``boilerplate`` — the heuristic quality bucket
   (text_analysis.quality_score).
5. ``repetitive``    — duplicate-token mass above REP_MAX_MILLI
   (text_analysis.repetition_signals).
6. ``ok``            — keep.

Scale shape: four equi-joins on unique doc_id over the outputs of
operators that are each individually linear — no new shuffle pattern
beyond theirs; AQE sizes every join (all sides are one row per doc or
smaller). The DuckDB oracle composes the SAME per-operator oracle SQL
generators, so the manifest is verified end-to-end, not re-derived.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup
from . import text_analysis as ta

REP_MAX_MILLI = 600  # duplicate-token mass (milli) above which a doc drops


def curation_manifest(docs: DataFrame, rep_max_milli: int = REP_MAX_MILLI) -> DataFrame:
    """(doc_id, keep, reason) over the given documents table — see the
    module docstring for the rule ladder.

    Owned-cache chain: decontaminate() returns an eagerly persisted
    dependency; the manifest materializes its own (persisted) result,
    then RELEASES that dependency — so composing the end product does
    not leak the intermediate cache. The returned manifest itself is
    persisted (it is the end product — callers write it out or join
    against it repeatedly) and is the caller's to unpersist."""
    from pyspark import StorageLevel

    keepl = dedup.dedup_keeplist(docs).select("doc_id", F.col("keep").alias("dd_keep"))
    qual = ta.quality_score(docs).select("doc_id", "quality_bucket")
    rep = ta.repetition_signals(docs).select("doc_id", "dup_token_milli")
    dec = dedup.decontaminate(docs)
    is_eval = (F.col("doc_id") % dedup.EVAL_MOD) == dedup.EVAL_RES
    reason = (
        F.when(is_eval, F.lit("eval_holdout"))
        .when(~F.col("dd_keep"), F.lit("duplicate"))
        .when(F.coalesce("n_contaminated", F.lit(0)) > 0, F.lit("contaminated"))
        .when(F.col("quality_bucket") != "ok", F.col("quality_bucket"))
        .when(F.col("dup_token_milli") > rep_max_milli, F.lit("repetitive"))
        .otherwise(F.lit("ok"))
    )
    out = (
        docs.select("doc_id")
        .join(keepl, "doc_id", "left")
        .join(qual, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .join(dec.select("doc_id", "n_contaminated"), "doc_id", "left")
        .select(
            "doc_id",
            (reason == "ok").alias("keep"),
            reason.alias("reason"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out.count()
    dec.unpersist()
    return out


def duckdb_curation_sql(
    table_sql: str, rep_max_milli: int = REP_MAX_MILLI
) -> str:
    """Composes the per-operator oracle generators — the manifest's
    oracle IS the composition of the already-verified oracles."""
    return f"""
    WITH base AS ({table_sql}),
    keepl AS (SELECT * FROM ({dedup.duckdb_keeplist_sql(table_sql)})),
    qual AS (
      SELECT doc_id, quality_bucket
      FROM ({ta.duckdb_quality_sql(f"({table_sql})")})
    ),
    rep AS (
      SELECT doc_id, dup_token_milli
      FROM ({ta.duckdb_repetition_sql(f"({table_sql})")})
    ),
    dec AS (SELECT * FROM ({dedup.duckdb_decontaminate_sql(table_sql)})),
    reasons AS (
      SELECT b.doc_id,
             CASE
               WHEN b.doc_id % {dedup.EVAL_MOD} = {dedup.EVAL_RES}
                 THEN 'eval_holdout'
               WHEN NOT k.keep THEN 'duplicate'
               WHEN coalesce(d.n_contaminated, 0) > 0 THEN 'contaminated'
               WHEN q.quality_bucket != 'ok' THEN q.quality_bucket
               WHEN r.dup_token_milli > {rep_max_milli} THEN 'repetitive'
               ELSE 'ok'
             END AS reason
      FROM base b
      LEFT JOIN keepl k USING (doc_id)
      LEFT JOIN qual q USING (doc_id)
      LEFT JOIN rep r USING (doc_id)
      LEFT JOIN dec d USING (doc_id)
    )
    SELECT doc_id, (reason = 'ok') AS keep, reason FROM reasons
    """


def datacard(docs: DataFrame, raw_docs: DataFrame) -> DataFrame:
    """Per-(source, reason) DATACARD — the dataset-documentation rollup
    (Datasheets-for-Datasets / Dolma data card shape): for every
    source, how many documents and tokens land on each curation
    outcome, and each outcome's share of the source. This is the table
    a release report prints; the manifest is per-document, the
    datacard is what humans read.

    ``docs`` is the (possibly mutant-augmented) corpus the manifest was
    computed over; ``raw_docs`` carries the source column. Synthetic
    near-dup/clone docs (ids beyond the raw range) attribute to the
    'synthetic' source via the left join's null — deterministic in
    both engines.

    Scale shape: the per-doc joins are doc_id-keyed and linear (AQE
    sizes them); the rollup is ONE map-side-combining shuffle to a
    table bounded by |sources| x |reasons|; the share window runs on
    that bounded table only. Composes curation_manifest (and releases
    its persisted dependency after materializing — the owned-cache
    chain).

    Output: (source, reason, n_docs, n_tokens, docs_milli)."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    from .text_analysis import tokens_col

    manifest = curation_manifest(docs)
    toks = docs.select(
        "doc_id", F.size(tokens_col(F.col("text"))).alias("n_toks")
    )
    src = raw_docs.select("doc_id", "source")
    rolled = (
        manifest.join(toks, "doc_id")
        .join(src, "doc_id", "left")
        .select(
            F.coalesce("source", F.lit("synthetic")).alias("source"),
            "reason",
            "n_toks",
        )
        .groupBy("source", "reason")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
    )
    w = Window.partitionBy("source")
    # integer div, not double-divide-then-cast: Spark's long cast
    # truncates while DuckDB's rounds — floor division agrees exactly
    out = (
        rolled.withColumn(
            "total", F.sum("n_docs").over(w).cast("long")
        )
        .select(
            "source",
            "reason",
            "n_docs",
            "n_tokens",
            F.expr("(n_docs * 1000) div total").alias("docs_milli"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out.count()
    manifest.unpersist()
    return out


def duckdb_datacard_sql(table_sql: str, raw_table: str = "documents") -> str:
    return f"""
    WITH manifest AS ({duckdb_curation_sql(table_sql)}),
    toks AS (
      SELECT doc_id,
             len(regexp_split_to_array(lower(text), '\\s+'))::BIGINT
               AS n_toks
      FROM ({table_sql})
    ),
    rolled AS (
      SELECT coalesce(r.source, 'synthetic') AS source, m.reason,
             count(*)::BIGINT AS n_docs, sum(t.n_toks)::BIGINT AS n_tokens
      FROM manifest m
      JOIN toks t USING (doc_id)
      LEFT JOIN {raw_table} r USING (doc_id)
      GROUP BY 1, 2
    )
    SELECT source, reason, n_docs, n_tokens,
           CAST((n_docs * 1000) // sum(n_docs) OVER (PARTITION BY source)
                AS BIGINT) AS docs_milli
    FROM rolled
    """
