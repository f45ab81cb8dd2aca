"""BPE tokenizer vocabulary training (Sennrich et al. 2016) over the
documents table — the merge-learning half of the "BPE-ish" lexer that
`text_analysis.token_stats` counts with.

A training-data pipeline doesn't just COUNT tokens; it trains the
tokenizer: learn the `merges` most frequent adjacent symbol pairs over
the corpus word-frequency table, greedily left-to-right, exactly the
algorithm of Sennrich et al. 2016 (learn_bpe): start from characters
(word-final char carries the `</w>` end-of-word marker), and each
iteration (1) counts every adjacent symbol pair weighted by word
frequency (all adjacent positions count, the standard convention — so
"aaa" contributes (a,a) twice even though one merge pass would only
rewrite one of them), (2) merges the winner everywhere, greedy
left-to-right non-overlapping.

Spark-first shape — the same bounded-state discipline as
`clustering.kmeans_clusters`:

- **The only corpus-scale work is one map-side-combining shuffle**: the
  word-frequency aggregation. Everything after runs on the bounded
  vocabulary table (distinct words — ~1e8 rows at web scale, persisted
  once), never the corpus.
- **Per merge iteration**: one map-side-combining shuffle of pair
  counts over the vocab table plus a 1-row driver collect (the winning
  pair). Driver state is the merge list itself — `merges` pairs, the
  artifact being trained (a production run's 32k-merge budget is 32k
  iterations of bounded-table scans; incremental pair-count maintenance
  is the classic single-node optimization, deliberately traded away
  here for a stateless re-count that any executor count can rerun).
- **Symbol state is never materialized between iterations.** Iteration
  i re-derives each word's segmentation from the base character string
  by replaying merges 1..i-1 as chained fold expressions — the k-means
  "literal centroids" trick applied to merges, keeping the plan flat
  (no persist-chains, no lineage blowup) at O(merges^2) fold passes
  over the bounded vocab table.
- **Engine-exact greedy merge as a string fold.** A word's symbol
  sequence is a `\\x1f`-joined string (the separator can't occur in
  `[a-z]`/`</w>` symbols); one merge pass folds symbol-by-symbol with
  "if the accumulator's last symbol is exactly `a` and the next symbol
  is `b`, append `b` to it, else append a new symbol". A merged symbol
  is `a||b` which is strictly longer than `a`, so it can never re-match
  as the left side within the same pass — the fold IS greedy
  left-to-right non-overlapping, bit-identical in Spark `F.aggregate`
  and DuckDB `list_reduce`.

Ties break on (pair_count DESC, left_sym, right_sym) — deterministic in
both engines. Training raises loudly if the corpus runs out of pairs
before `merges` iterations (the oracle CTE chain is fixed-length and
cannot shrink to match an early stop).

Outputs:
- `bpe_merges_df`: (merge_rank, left_sym, right_sym, pair_count) — the
  trained merge table, `merges` rows. Like kmeans, TRAINING runs eager
  per-iteration collects; the returned DataFrame carries the collected
  merge rows (each one the result of a distributed count).
- `bpe_segment`: (word, freq, n_syms, segmentation) — every vocab
  word's final segmentation under the learned merges, derived lazily
  from the merge literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

SEP = "\x1f"
EOW = "</w>"
WORD_RE = "[a-z]+"
BPE_MERGES = 12


# ----------------------------------------------------------------- spark
def _word_freqs(docs: DataFrame) -> DataFrame:
    """(word, freq): every `[a-z]+` run of the lowercased corpus. The
    one corpus-scale shuffle (map-side combining)."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit(WORD_RE), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _init_s(word: Column) -> Column:
    """SEP-prefixed symbol string of a word: one symbol per character,
    the last carrying the end-of-word marker (`...\\x1fc\\x1fd</w>`)."""
    return F.concat(
        F.concat_ws(
            "", F.transform(F.split(word, ""), lambda c: F.concat(F.lit(SEP), c))
        ),
        F.lit(EOW),
    )


def _syms(s: Column) -> Column:
    return F.filter(F.split(s, SEP), lambda x: x != F.lit(""))


def _apply_merge(s: Column, a: str, b: str) -> Column:
    """One greedy left-to-right merge pass of (a, b) over a SEP-joined
    symbol string (see module docstring for why the fold is exact)."""
    tail = F.lit(SEP + a)
    return F.aggregate(
        _syms(s),
        F.lit(""),
        lambda acc, x: F.when(
            F.endswith(acc, tail) & (x == F.lit(b)), F.concat(acc, x)
        ).otherwise(F.concat(acc, F.lit(SEP), x)),
    )


def _apply_merges(s: Column, merges: list[tuple[str, str]]) -> Column:
    for a, b in merges:
        s = _apply_merge(s, a, b)
    return s


def _pair_counts(vocab: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Corpus-weighted adjacent-pair counts under the merges so far.
    The symbol array is staged in its own projection so the pair
    transform references it once (the lambda-CSE trap)."""
    staged = vocab.select(
        "freq", _syms(_apply_merges(_init_s(F.col("word")), merges)).alias("syms")
    ).filter(F.size("syms") >= 2)
    pairs = staged.select(
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at("syms", i).alias("l"),
                    F.element_at("syms", i + 1).alias("r"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
    ).agg(F.sum("freq").alias("pair_count"))


def bpe_train(docs: DataFrame, merges: int = BPE_MERGES) -> list[tuple[str, str, int]]:
    """Learn `merges` merge rules; returns [(left, right, pair_count)]
    in rank order. Eager: one pair-count job per merge (inherent to the
    algorithm — each choice conditions the next count)."""
    vocab = _word_freqs(docs).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        learned: list[tuple[str, str, int]] = []
        for i in range(merges):
            top = (
                _pair_counts(vocab, [(a, b) for a, b, _ in learned])
                .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
                .limit(1)
                .collect()
            )
            if not top:
                raise ValueError(
                    f"bpe_train: corpus exhausted adjacent pairs at merge "
                    f"{i + 1}/{merges} — every word is a single symbol; "
                    "lower `merges` (the fixed-length oracle cannot model "
                    "an early stop)"
                )
            r = top[0]
            learned.append((r["left_sym"], r["right_sym"], int(r["pair_count"])))
        return learned
    finally:
        vocab.unpersist()


def bpe_merges_df(
    spark: SparkSession, docs: DataFrame, merges: int = BPE_MERGES
) -> DataFrame:
    """The trained merge table (merge_rank, left_sym, right_sym,
    pair_count). The rows are driver-collected training results (each
    pair_count is a distributed aggregation's output), re-wrapped as a
    bounded literal DataFrame — the same eager-build caveat as
    kmeans_clusters' centroids."""
    learned = bpe_train(docs, merges)
    return spark.createDataFrame(
        [(i + 1, a, b, c) for i, (a, b, c) in enumerate(learned)],
        schema="merge_rank INT, left_sym STRING, right_sym STRING, pair_count BIGINT",
    )


def bpe_segment(docs: DataFrame, merges: int = BPE_MERGES) -> DataFrame:
    """(word, freq, n_syms, segmentation): every vocabulary word's
    final symbol split under the learned merges — the trained
    tokenizer applied to its own vocab, derived lazily from the merge
    literals (training itself is eager, see bpe_train)."""
    learned = bpe_train(docs, merges)
    staged = _word_freqs(docs).select(
        "word",
        "freq",
        _syms(
            _apply_merges(_init_s(F.col("word")), [(a, b) for a, b, _ in learned])
        ).alias("syms"),
    )
    return staged.select(
        "word",
        "freq",
        F.size("syms").cast("long").alias("n_syms"),
        F.concat_ws(" ", "syms").alias("segmentation"),
    )


def bpe_encode(docs: DataFrame, merges: int = BPE_MERGES) -> DataFrame:
    """The trained tokenizer applied corpus-wide: per-document word and
    BPE-token counts under the learned merges.

    This is the shape a real pipeline tokenizes 100 TB with: the
    vocabulary's per-word token length (bounded table) joins the
    exploded word stream — AQE broadcasts the vocab side, so the
    corpus-scale work is one narrow explode plus one map-side-combining
    groupBy(doc_id); no word-level shuffle of the corpus.

    Output: (doc_id, n_words, n_bpe_tokens)."""
    learned = bpe_train(docs, merges)
    vocab_len = _word_freqs(docs).select(
        "word",
        F.size(
            _syms(
                _apply_merges(_init_s(F.col("word")), [(a, b) for a, b, _ in learned])
            )
        )
        .cast("long")
        .alias("n_syms"),
    )
    doc_words = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_RE), 0)
        ).alias("word"),
    )
    return (
        doc_words.join(vocab_len, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
        )
    )


# ---------------------------------------------------------------- duckdb
def _duck_syms(s: str) -> str:
    return f"list_filter(string_split({s}, chr(31)), x -> x <> '')"


def _duck_apply(s: str, a_expr: str, b_expr: str) -> str:
    """DuckDB twin of _apply_merge: same fold, same greedy contract.
    list_prepend('') seeds the accumulator exactly like F.aggregate's
    empty-string init."""
    return (
        f"list_reduce(list_prepend('', {_duck_syms(s)}), "
        f"(acc, x) -> CASE WHEN ends_with(acc, chr(31)||{a_expr}) "
        f"AND x = {b_expr} THEN acc||x ELSE acc||chr(31)||x END)"
    )


def _bpe_ctes(table: str, merges: int) -> list[str]:
    """The shared CTE chain: w (word freqs) -> v0 (char symbols) ->
    [p{i} (pair counts) -> m{i} (winner) -> v{i} (merged)] x merges.
    v/m stages are MATERIALIZED: each v{i-1} is referenced twice (pair
    count + rewrite), and inlining would double the fold tree per
    level."""
    init_s = (
        "array_to_string(list_transform(string_split(word, ''), "
        f"c -> chr(31)||c), '') || '{EOW}'"
    )
    ctes = [
        f"""w AS MATERIALIZED (
          SELECT word, count(*)::BIGINT AS freq FROM (
            SELECT unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS word
            FROM {table}) GROUP BY word)""",
        f"v0 AS MATERIALIZED (SELECT word, freq, {init_s} AS s FROM w)",
    ]
    for i in range(1, merges + 1):
        prev = f"v{i - 1}"
        ctes.append(
            f"""p{i} AS (
          SELECT p.l AS left_sym, p.r AS right_sym,
                 sum(freq)::BIGINT AS pair_count
          FROM (SELECT freq,
                       unnest(list_transform(range(1, len(syms)),
                         i -> {{'l': syms[CAST(i AS INT)],
                               'r': syms[CAST(i+1 AS INT)]}})) AS p
                FROM (SELECT freq, {_duck_syms('s')} AS syms FROM {prev})
                WHERE len(syms) >= 2)
          GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""m{i} AS MATERIALIZED (
          SELECT left_sym, right_sym, pair_count FROM p{i}
          ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1)"""
        )
        ctes.append(
            f"""v{i} AS MATERIALIZED (
          SELECT word, freq,
                 {_duck_apply('v.s', 'm.left_sym', 'm.right_sym')} AS s
          FROM {prev} v CROSS JOIN m{i} m)"""
        )
    return ctes


def duckdb_bpe_merges_sql(table: str = "documents", merges: int = BPE_MERGES) -> str:
    ctes = _bpe_ctes(table, merges)
    sels = " UNION ALL ".join(
        f"SELECT {i} AS merge_rank, left_sym, right_sym, pair_count FROM m{i}"
        for i in range(1, merges + 1)
    )
    return f"WITH {','.join(ctes)} SELECT * FROM ({sels}) ORDER BY merge_rank"


def duckdb_bpe_segment_sql(table: str = "documents", merges: int = BPE_MERGES) -> str:
    ctes = _bpe_ctes(table, merges)
    return f"""WITH {','.join(ctes)}
    SELECT word, freq, len(syms)::BIGINT AS n_syms,
           array_to_string(syms, ' ') AS segmentation
    FROM (SELECT word, freq, {_duck_syms('s')} AS syms FROM v{merges})"""


def duckdb_bpe_encode_sql(table: str = "documents", merges: int = BPE_MERGES) -> str:
    ctes = _bpe_ctes(table, merges)
    return f"""WITH {','.join(ctes)},
    vocab_len AS (
      SELECT word, len({_duck_syms('s')})::BIGINT AS n_syms FROM v{merges}),
    doc_words AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS word
      FROM {table})
    SELECT doc_id, count(*)::BIGINT AS n_words,
           sum(n_syms)::BIGINT AS n_bpe_tokens
    FROM doc_words JOIN vocab_len USING (word)
    GROUP BY doc_id"""


# ------------------------------------------------ character coverage
COVERAGE_CUTOFF_PPM = 999_500  # SentencePiece's 0.9995 character_coverage


def char_coverage(docs: DataFrame) -> DataFrame:
    """SentencePiece-style CHARACTER COVERAGE table — the statistic that
    fixes a tokenizer's base alphabet (characters inside the coverage
    cutoff become vocabulary atoms; the long tail maps to <unk>/bytes).
    For every character of the lowered corpus: count, frequency rank
    (count desc, char asc — deterministic), cumulative coverage in ppm,
    and whether it falls inside the 0.9995 cutoff.

    in_alphabet is decided on the PREVIOUS character's cumulative ppm
    (a character is included while coverage is still below the cutoff —
    so the character that crosses the line is the last one in), which
    keeps the rule exact under floor-ppm arithmetic in both engines.

    Plan: one map-side-combining shuffle over the exploded char stream
    (split('') — one O(n) pass per doc); rank/cumsum windows run on the
    BOUNDED alphabet table (|distinct chars|, dozens here, ~1e4 for
    CJK). Output: (ch, cnt, rank, cum_ppm, in_alphabet)."""
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(F.split(F.lower("text"), "")).alias("ch"))
        .groupBy("ch")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("ch").asc())
    wall = Window.partitionBy()
    ranked = counts.select(
        "ch",
        "cnt",
        F.row_number().over(w).alias("rank"),
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
        F.sum("cnt").over(wall).alias("total"),
    )
    return ranked.select(
        "ch",
        "cnt",
        F.col("rank").cast("int").alias("rank"),
        F.expr("(cum * 1000000) div total").alias("cum_ppm"),
        (
            F.expr("((cum - cnt) * 1000000) div total")
            < COVERAGE_CUTOFF_PPM
        ).alias("in_alphabet"),
    )


def duckdb_char_coverage_sql(table: str = "documents") -> str:
    return f"""
    WITH counts AS (
      -- substring-per-position, the established char twin (DuckDB's
      -- string_split('') semantics differ from Spark's split(''))
      SELECT ch, count(*)::BIGINT AS cnt
      FROM (SELECT substring(lower(text), CAST(i AS INT), 1) AS ch
            FROM {table},
                 UNNEST(range(1, length(text) + 1)) AS t(i))
      GROUP BY 1
    ),
    ranked AS (
      SELECT ch, cnt,
             row_number() OVER (ORDER BY cnt DESC, ch ASC) AS rank,
             sum(cnt) OVER (ORDER BY cnt DESC, ch ASC
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER () AS total
      FROM counts
    )
    SELECT ch, cnt, CAST(rank AS INT) AS rank,
           CAST((cum * 1000000) // total AS BIGINT) AS cum_ppm,
           (((cum - cnt) * 1000000) // total < {COVERAGE_CUTOFF_PPM})
             AS in_alphabet
    FROM ranked
    """
