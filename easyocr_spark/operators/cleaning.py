"""C4-style line-level corpus cleaning (Raffel et al. 2020, §2.2).

The classic web-text scrub the T5 corpus was built with, applied as
pure JVM-side codegen — one narrow projection, zero shuffles, zero
Python, scaling with input splits like a parquet scan:

document rules (drop the whole page):
  - contains a curly brace  -> 'drop_brace'   (code, not prose)
  - contains 'lorem ipsum'  -> 'drop_lorem'   (placeholder boilerplate)
line rules (keep a line only if ALL hold):
  - ends in terminal punctuation (. ! ? ")
  - has at least 5 whitespace words
  - does not contain the word 'javascript'

The synthetic word-soup corpus has no newlines, braces or boilerplate,
so the query deterministically AUGMENTS docs keyed on ``doc_id % 5``
(the pii_scan pattern — the oracle performs the identical
augmentation): 0 plants a code line with braces (doc drop), 1 a
too-short line next to a keepable sentence, 2 a javascript notice,
3 a lorem-ipsum block (doc drop), 4 leaves the base line UNpunctuated
so even the main text fails the terminal-punctuation rule (the
0-kept-lines case). The clean/filter body itself is corpus-agnostic —
on real data, drop the augmentation and run the same projection.

Reference parity note: EasyOCR has no corpus-cleaning stage (its
pipeline ends at recognized text, easyocr/easyocr.py:385-465); this
operator belongs to the training-data surface the round brief adds.

Output: (doc_id, doc_action, n_lines, n_kept, kept_md5) — kept_md5 is
md5 of the kept lines rejoined with newline, md5('') for dropped docs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL_RE = r'[.!?"]$'
MIN_WORDS = 5
BAD_WORD = "javascript"


def _augmented(docs: DataFrame) -> DataFrame:
    injected = (
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit(".\nvar config = { enabled: true };"),
        )
        .when(
            F.col("doc_id") % 5 == 1,
            F.lit(
                ".\nok\nthis additional sentence definitely has"
                " enough words here."
            ),
        )
        .when(
            F.col("doc_id") % 5 == 2,
            F.lit(
                ".\nplease enable javascript to continue reading"
                " this page now."
            ),
        )
        .when(
            F.col("doc_id") % 5 == 3,
            F.lit(
                ".\nlorem ipsum dolor sit amet consectetur"
                " adipiscing elit sed."
            ),
        )
        .otherwise(F.lit(" trailing clause with no terminal punctuation"))
    )
    return docs.select(
        "doc_id", F.lower(F.concat(F.col("text"), injected)).alias("aug")
    )


def _keep_line(x: Column) -> Column:
    return (
        x.rlike(TERMINAL_RE)
        & (F.size(F.split(x, r"\s+")) >= MIN_WORDS)
        & ~x.contains(BAD_WORD)
    )


def c4_clean(docs: DataFrame) -> DataFrame:
    aug = _augmented(docs)
    a = F.col("aug")
    action = (
        F.when(a.contains("{"), F.lit("drop_brace"))
        .when(a.contains("lorem ipsum"), F.lit("drop_lorem"))
        .otherwise(F.lit("keep"))
    )
    lines = F.split(a, "\n")
    kept = F.filter(lines, _keep_line)
    keep_doc = F.col("doc_action") == "keep"
    return (
        aug.select("doc_id", a.alias("aug"), action.alias("doc_action"))
        .select(
            "doc_id",
            "doc_action",
            F.size(lines).cast("long").alias("n_lines"),
            F.when(keep_doc, F.size(kept))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_kept"),
            F.md5(
                F.when(keep_doc, F.array_join(kept, "\n")).otherwise(
                    F.lit("")
                )
            ).alias("kept_md5"),
        )
    )


def duckdb_c4_clean_sql(table: str = "documents") -> str:
    keep = (
        f"regexp_matches(x, '{TERMINAL_RE}') "
        f"AND len(regexp_split_to_array(x, '\\s+')) >= {MIN_WORDS} "
        f"AND NOT contains(x, '{BAD_WORD}')"
    )
    return f"""
    WITH aug AS (
      SELECT doc_id,
             lower(text || CASE doc_id % 5
               WHEN 0 THEN '.' || chr(10) || 'var config = {{ enabled: true }};'
               WHEN 1 THEN '.' || chr(10) || 'ok' || chr(10)
                 || 'this additional sentence definitely has enough words here.'
               WHEN 2 THEN '.' || chr(10)
                 || 'please enable javascript to continue reading this page now.'
               WHEN 3 THEN '.' || chr(10)
                 || 'lorem ipsum dolor sit amet consectetur adipiscing elit sed.'
               ELSE ' trailing clause with no terminal punctuation'
             END) AS aug
      FROM {table}
    ),
    marked AS (
      SELECT doc_id, aug,
             CASE WHEN contains(aug, '{{') THEN 'drop_brace'
                  WHEN contains(aug, 'lorem ipsum') THEN 'drop_lorem'
                  ELSE 'keep' END AS doc_action,
             string_split(aug, chr(10)) AS lines
      FROM aug
    )
    SELECT doc_id, doc_action,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(CASE WHEN doc_action = 'keep'
                THEN len(list_filter(lines, x -> {keep}))
                ELSE 0 END AS BIGINT) AS n_kept,
           -- array_to_string([]) is NULL in DuckDB (Spark array_join
           -- gives ''): coalesce so the 0-kept-lines doc hashes ''
           md5(CASE WHEN doc_action = 'keep'
               THEN coalesce(array_to_string(
                      list_filter(lines, x -> {keep}), chr(10)), '')
               ELSE '' END) AS kept_md5
    FROM marked
    """
