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


# ------------------------------------------------- Gopher quality rules
# Rae et al. 2021 (Gopher), appendix A1.1 — the published rule set,
# evaluated as an explicit per-rule audit table (quality_score is the
# composite-bucket sibling; this is the rule-by-rule evidence a curation
# run records). Thresholds in engine-exact integer milli-units.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MWL_LO, GOPHER_MWL_HI = 3_000, 10_000   # mean word length, milli
GOPHER_SYM_MAX = 100        # symbol-to-word ratio <= 0.1
GOPHER_BULLET_MAX = 900     # <= 90% of lines start with a bullet
GOPHER_ELLIPSIS_MAX = 300   # <= 30% of lines end with an ellipsis
GOPHER_ALPHA_MIN = 800      # >= 80% of words contain a letter
GOPHER_MIN_STOPWORDS = 2    # >= 2 distinct required stopwords


def _gopher_augmented(docs: DataFrame) -> DataFrame:
    """doc_id % 4 plants one rule violation per class (the corpus has
    no bullets/ellipses/symbols of its own): 0 = injected stopwords so
    fully-passing docs exist, 1 = 10 bullet lines (>90%), 2 = two
    ellipsis lines (>30%), 3 = a hash-symbol block. Identical in the
    oracle; the rule body is corpus-agnostic."""
    bullets = "\n".join("• item" for _ in range(10))
    injected = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(" that have with to"))
        .when(F.col("doc_id") % 4 == 1, F.lit("\n" + bullets))
        .when(
            F.col("doc_id") % 4 == 2,
            F.lit("\ncontinued story text...\nmore chapters follow..."),
        )
        .otherwise(F.lit(" ### ### ### ### ###"))
    )
    return docs.select(
        "doc_id", F.lower(F.concat(F.col("text"), injected)).alias("aug")
    )


def gopher_rules(docs: DataFrame) -> DataFrame:
    """Per-document Gopher rule audit: every published predicate as a
    column plus the keep verdict and the FIRST failing rule in the
    paper's order — one narrow zero-shuffle projection.

    Output: (doc_id, n_words, mwl_milli, sym_milli, bullet_milli,
    ellipsis_milli, alpha_milli, n_req_stop, gopher_keep, first_fail)."""
    aug = _gopher_augmented(docs)
    a = F.col("aug")
    toks = F.split(a, r"\s+")
    lines = F.split(a, "\n")
    n_words = F.size(toks).cast("long")
    n_lines = F.size(lines).cast("long")
    staged = aug.select(
        "doc_id",
        n_words.alias("n_words"),
        n_lines.alias("n_lines"),
        F.length(F.regexp_replace(a, r"\s+", "")).cast("long").alias("letters"),
        (
            F.length(a) - F.length(F.regexp_replace(a, "#", ""))
            + F.size(F.regexp_extract_all(a, F.lit(r"\.\.\."), 0))
        ).cast("long").alias("n_symbols"),
        F.size(F.filter(lines, lambda l: l.startswith("•")))
        .cast("long")
        .alias("n_bullet_lines"),
        F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.$")))
        .cast("long")
        .alias("n_ellipsis_lines"),
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
        .cast("long")
        .alias("n_alpha_words"),
        F.size(
            F.array_intersect(
                F.array_distinct(toks),
                F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            )
        ).cast("long").alias("n_req_stop"),
    )
    m = staged.select(
        "doc_id",
        "n_words",
        F.expr("(letters * 1000) div n_words").alias("mwl_milli"),
        F.expr("(n_symbols * 1000) div n_words").alias("sym_milli"),
        F.expr("(n_bullet_lines * 1000) div n_lines").alias("bullet_milli"),
        F.expr("(n_ellipsis_lines * 1000) div n_lines").alias("ellipsis_milli"),
        F.expr("(n_alpha_words * 1000) div n_words").alias("alpha_milli"),
        "n_req_stop",
    )
    rules = [
        (
            "word_count",
            (F.col("n_words") >= GOPHER_MIN_WORDS)
            & (F.col("n_words") <= GOPHER_MAX_WORDS),
        ),
        (
            "mean_word_len",
            (F.col("mwl_milli") >= GOPHER_MWL_LO)
            & (F.col("mwl_milli") <= GOPHER_MWL_HI),
        ),
        ("symbol_ratio", F.col("sym_milli") <= GOPHER_SYM_MAX),
        ("bullet_lines", F.col("bullet_milli") <= GOPHER_BULLET_MAX),
        ("ellipsis_lines", F.col("ellipsis_milli") <= GOPHER_ELLIPSIS_MAX),
        ("alpha_words", F.col("alpha_milli") >= GOPHER_ALPHA_MIN),
        ("stopwords", F.col("n_req_stop") >= GOPHER_MIN_STOPWORDS),
    ]
    keep = rules[0][1]
    for _, cond in rules[1:]:
        keep = keep & cond
    first_fail = F.lit("")
    for name, cond in reversed(rules):
        first_fail = F.when(~cond, F.lit(name)).otherwise(first_fail)
    return m.select(
        "doc_id",
        "n_words",
        "mwl_milli",
        "sym_milli",
        "bullet_milli",
        "ellipsis_milli",
        "alpha_milli",
        "n_req_stop",
        keep.alias("gopher_keep"),
        first_fail.alias("first_fail"),
    )


def duckdb_gopher_rules_sql(table: str = "documents") -> str:
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    rules = [
        ("word_count", f"(n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})"),
        ("mean_word_len", f"(mwl_milli >= {GOPHER_MWL_LO} AND mwl_milli <= {GOPHER_MWL_HI})"),
        ("symbol_ratio", f"(sym_milli <= {GOPHER_SYM_MAX})"),
        ("bullet_lines", f"(bullet_milli <= {GOPHER_BULLET_MAX})"),
        ("ellipsis_lines", f"(ellipsis_milli <= {GOPHER_ELLIPSIS_MAX})"),
        ("alpha_words", f"(alpha_milli >= {GOPHER_ALPHA_MIN})"),
        ("stopwords", f"(n_req_stop >= {GOPHER_MIN_STOPWORDS})"),
    ]
    keep = " AND ".join(c for _, c in rules)
    first_fail = "''"
    for name, cond in reversed(rules):
        first_fail = f"CASE WHEN NOT {cond} THEN '{name}' ELSE {first_fail} END"
    return f"""
    WITH aug AS (
      SELECT doc_id,
             lower(text || CASE doc_id % 4
               WHEN 0 THEN ' that have with to'
               WHEN 1 THEN chr(10) ||
                 {" || chr(10) || ".join(["'• item'"] * 10)}
               WHEN 2 THEN chr(10) || 'continued story text...'
                 || chr(10) || 'more chapters follow...'
               ELSE ' ### ### ### ### ###'
             END) AS aug
      FROM {table}
    ),
    staged AS (
      SELECT doc_id,
             len(regexp_split_to_array(aug, '\\s+'))::BIGINT AS n_words,
             len(string_split(aug, chr(10)))::BIGINT AS n_lines,
             length(regexp_replace(aug, '\\s+', '', 'g'))::BIGINT AS letters,
             (length(aug) - length(replace(aug, '#', ''))
              + len(regexp_extract_all(aug, '\\.\\.\\.')))::BIGINT AS n_symbols,
             len(list_filter(string_split(aug, chr(10)),
                             l -> starts_with(l, '•')))::BIGINT
               AS n_bullet_lines,
             len(list_filter(string_split(aug, chr(10)),
                             l -> regexp_matches(l, '\\.\\.\\.$')))::BIGINT
               AS n_ellipsis_lines,
             len(list_filter(regexp_split_to_array(aug, '\\s+'),
                             t -> regexp_matches(t, '[a-z]')))::BIGINT
               AS n_alpha_words,
             len(list_intersect(
                   list_distinct(regexp_split_to_array(aug, '\\s+')),
                   [{stop_list}]))::BIGINT AS n_req_stop
      FROM aug
    ),
    m AS (
      SELECT doc_id, n_words,
             (letters * 1000) // n_words AS mwl_milli,
             (n_symbols * 1000) // n_words AS sym_milli,
             (n_bullet_lines * 1000) // n_lines AS bullet_milli,
             (n_ellipsis_lines * 1000) // n_lines AS ellipsis_milli,
             (n_alpha_words * 1000) // n_words AS alpha_milli,
             n_req_stop
      FROM staged
    )
    SELECT doc_id, n_words, mwl_milli, sym_milli, bullet_milli,
           ellipsis_milli, alpha_milli, n_req_stop,
           ({keep}) AS gopher_keep,
           {first_fail} AS first_fail
    FROM m
    """


# ---------------------------------------------------- text normalization
# the canonical pre-tokenization scrub: control chars out, zero-widths
# out, unicode spaces folded, whitespace collapsed, edges trimmed
CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
ZERO_WIDTH_RE = "[\u200b\u200c\u200d\ufeff]"
UNICODE_SPACE_RE = "[\u00a0\u2000-\u200a\u3000]"


def _normalize_expr(col):
    x = F.regexp_replace(col, CONTROL_RE, "")
    x = F.regexp_replace(x, ZERO_WIDTH_RE, "")
    x = F.regexp_replace(x, UNICODE_SPACE_RE, " ")
    return F.trim(F.regexp_replace(x, r"\s+", " "))


def _dirty(docs: DataFrame) -> DataFrame:
    """doc_id % 4 plants one dirt class (the corpus is already clean):
    1 = control chars + tab runs, 2 = zero-width joiners inside a word,
    3 = NBSP/ideographic spaces, 0 = untouched negative control.
    Identical in the oracle (chr() arithmetic there)."""
    injected = (
        F.when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("\x01\x02  trailing\t\tcontrol "), F.col("text")
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.col("text"),
                F.lit(" zero\u200bwidth\u200djoin\ufeff"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 3,
            F.concat(
                F.lit("nb\u00a0sp\u3000wide "), F.col("text")
            ),
        )
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", injected.alias("dirty"))


def normalize_text(docs: DataFrame) -> DataFrame:
    """Unicode text normalization — the first transform every corpus
    pipeline runs before tokenization: strip C0/DEL control characters,
    remove zero-width code points (ZWSP/ZWNJ/ZWJ/BOM — the invisible
    dedup-breakers), fold unicode spaces (NBSP, en/em spaces,
    ideographic space) to ASCII space, collapse whitespace runs, trim.
    One narrow zero-shuffle JVM-regex projection; the normalize body is
    corpus-agnostic (full NFKC — ligatures, width folding — is a
    table-driven superset a real deployment adds via a translate map;
    the classes handled here are the ones that break hashing/dedup).

    Output: (doc_id, changed, n_removed_chars, norm_md5) where
    n_removed_chars counts characters deleted or folded away and
    changed flags any difference from the dirty input."""
    d = _dirty(docs)
    norm = _normalize_expr(F.col("dirty"))
    return d.select(
        "doc_id",
        (norm != F.col("dirty")).alias("changed"),
        (F.length("dirty") - F.length(norm)).cast("long").alias(
            "n_removed_chars"
        ),
        F.md5(norm).alias("norm_md5"),
    )


def duckdb_normalize_text_sql(table: str = "documents") -> str:
    zw = "[\u200b\u200c\u200d\ufeff]"
    us = "[\u00a0\u2000-\u200a\u3000]"
    norm = (
        "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        "dirty, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),"
        f" '{zw}', '', 'g'),"
        f" '{us}', ' ', 'g'),"
        " '\\s+', ' ', 'g'))"
    )
    return f"""
    WITH d AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 1 THEN chr(1) || chr(2) || '  trailing' || chr(9)
                           || chr(9) || 'control ' || text
               WHEN 2 THEN text || ' zero' || chr(8203) || 'width'
                           || chr(8205) || 'join' || chr(65279)
               WHEN 3 THEN 'nb' || chr(160) || 'sp' || chr(12288)
                           || 'wide ' || text
               ELSE text
             END AS dirty
      FROM {table}
    )
    SELECT doc_id,
           ({norm} != dirty) AS changed,
           (length(dirty) - length({norm}))::BIGINT AS n_removed_chars,
           md5({norm}) AS norm_md5
    FROM d
    """
