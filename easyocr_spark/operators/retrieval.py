"""Inverted index construction — the retrieval-side artifact a corpus
pipeline emits next to the training shards (dedup audits, contamination
lookups, and eval-set retrieval all consume one).

Skew discipline is the whole design. A web corpus is Zipfian: "the"
appears in ~every document, so ANY plan that materializes a posting
list per word dies on the head words (a collect_list whose single group
is the corpus). The standard fix is what real indexes do — stats for
everything, positional postings only where they're bounded:

- `tf` (word, doc_id, cnt): ONE corpus-scale map-side-combining shuffle.
- `stats` (word, df, total_tf): map-side-combining aggregation of `tf` —
  this is where the head words end, as one row each.
- postings are built ONLY for words with df <= `df_cap`: the join
  against the qualifying-word set bounds every collect_list group to
  df_cap entries BEFORE aggregation, so no executor ever holds a head
  word's corpus-sized list. Head words report postings = '' (a real
  index shards those lists across segment files; the stats row is the
  honest single-table stand-in).

Posting lists are emitted as canonical strings ("doc:cnt doc:cnt", doc
ascending) — exact to compare across engines, and the on-disk shape a
segment file would store.

Output: (word, df, total_tf, postings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_RE = "[a-z]+"
POSTING_DF_CAP = 32


def inverted_index(docs: DataFrame, df_cap: int = POSTING_DF_CAP) -> DataFrame:
    tf = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit(WORD_RE), 0)
            ).alias("word"),
        )
        .groupBy("word", "doc_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = tf.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("cnt").alias("total_tf"),
    )
    small = stats.filter(F.col("df") <= df_cap).select("word")
    postings = (
        tf.join(small, "word")
        .groupBy("word")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "cnt"))
                    ),
                    lambda s: F.concat_ws(":", s["doc_id"], s["cnt"]),
                ),
                " ",
            ).alias("postings")
        )
    )
    return stats.join(postings, "word", "left").select(
        "word",
        "df",
        "total_tf",
        F.coalesce("postings", F.lit("")).alias("postings"),
    )


# ------------------------------------------------------- BM25 retrieval
BM25_K = 5  # hits kept per query
# fixed benchmark queries over the corpus vocabulary — the eval-set
# retrieval / contamination-lookup workload the inverted index exists for
BM25_QUERIES: list[tuple[str, str]] = [
    ("q_join", "spark join filter"),
    ("q_sort", "window merge sort"),
    ("q_scan", "slow customer scan batch"),
]


def bm25_topk(docs: DataFrame, k: int = BM25_K) -> DataFrame:
    """BM25 top-k retrieval for a bounded query set — the ranked-lookup
    end product of the index family (tfidf_top_terms is the per-doc
    keyword view; this is the per-QUERY ranking view, the shape of
    contamination lookups and eval retrieval over a training corpus).

    Scoring is Lucene-style BM25 (k1=1.2, b=0.75, the +1 idf so every
    weight is positive and integer `div` == floor everywhere):

        idf_milli(t) = floor(1000·(log2(2N+2) − log2(2·df+1)))
        contrib(t,d) = idf_milli · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))

    The tf-saturation fraction is cleared to EXACT integers by
    multiplying through by 10·L (avgdl = L/N, k1 = 12/10, b = 3/4):

        contrib_milli = (idf_milli · 22·L·tf) div (10·L·tf + 3·L + 9·N·dl)

    computed in decimal(38,0) / HUGEINT so the product never overflows
    at corpus scale (L ≈ 10^13 tokens at 100 TB); Spark's IntegralDivide
    on decimals is exact and agrees bit-for-bit with DuckDB's `//`.
    idf is frozen DRIVER-SIDE with CPython math.log2 (the
    lm_cross_entropy precedent — JVM Math.log differs from C libm by
    ulps and a floor on the boundary would flip); the collect is
    bounded by the QUERY-TERM COUNT, not the vocabulary.

    Plan shape: the term filter (literal IN-list) lands BEFORE the tf
    fold, so the only corpus-scale work is one map-side-combining
    shuffle over query-term postings + one narrow dl projection; the
    postings-side tables are query-bounded, so the dl join broadcasts
    them and the final top-k window has one partition per query
    (WindowGroupLimit partial top-k applies).

    Output: (query, rank, doc_id, n_hit_terms, score_milli)."""
    import math

    from pyspark.sql import Window

    from easyocr_spark.operators.text_analysis import tokens_col

    spark = docs.sparkSession
    terms = sorted({t for _, text in BM25_QUERIES for t in text.split()})
    qterms = spark.createDataFrame(
        [(q, t) for q, text in BM25_QUERIES for t in text.split()],
        schema="query string, term string",
    )

    dl = docs.select(
        "doc_id", F.size(tokens_col(F.col("text"))).alias("dl")
    )
    n_docs, total_toks = dl.agg(
        F.count(F.lit(1)), F.sum("dl")
    ).collect()[0]
    tf = (
        docs.select(
            "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
        )
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = {
        r["term"]: int(r["df"])
        for r in tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    idf = spark.createDataFrame(
        [
            (
                t,
                int(
                    math.floor(
                        1000.0
                        * (
                            math.log2(2 * n_docs + 2)
                            - math.log2(2 * dft[t] + 1)
                        )
                    )
                ),
            )
            for t in sorted(dft)
        ],
        schema="term string, idf_milli long",
    )
    dec = "decimal(38,0)"
    contrib = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            "term",
            F.expr(
                f"(CAST(idf_milli AS {dec}) * 22 * {total_toks} * tf) div "
                f"(CAST(10 AS {dec}) * {total_toks} * tf"
                f" + 3 * CAST({total_toks} AS {dec})"
                f" + 9 * CAST({n_docs} AS {dec}) * dl)"
            ).alias("c"),
        )
    )
    scored = (
        qterms.join(contrib, "term")
        .groupBy("query", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
            F.sum("c").alias("score_milli"),
        )
    )
    w = Window.partitionBy("query").orderBy(
        F.col("score_milli").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query",
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            "n_hit_terms",
            "score_milli",
        )
    )


def duckdb_bm25_sql(table: str = "documents", k: int = BM25_K) -> str:
    qvals = ", ".join(
        f"('{q}', '{t}')" for q, text in BM25_QUERIES for t in text.split()
    )
    terms = sorted({t for _, text in BM25_QUERIES for t in text.split()})
    inlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH q(query, term) AS (VALUES {qvals}),
    dl AS (
      SELECT doc_id,
             len(regexp_split_to_array(lower(text), '\\s+'))::BIGINT AS dl
      FROM {table}
    ),
    stats AS (SELECT count(*)::BIGINT AS n_docs,
                     sum(dl)::BIGINT AS total_toks FROM dl),
    tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
            FROM {table})
      WHERE term IN ({inlist})
      GROUP BY 1, 2
    ),
    idf AS (
      SELECT term,
             CAST(floor(1000.0 * (log2(2 * n_docs + 2)
                                  - log2(2 * count(*) + 1))) AS BIGINT)
               AS idf_milli
      FROM tf, stats GROUP BY term, n_docs
    ),
    contrib AS (
      SELECT tf.doc_id, tf.term,
             (idf_milli::HUGEINT * 22 * total_toks * tf) //
             (10::HUGEINT * total_toks * tf + 3::HUGEINT * total_toks
              + 9::HUGEINT * n_docs * dl) AS c
      FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), stats
    ),
    scored AS (
      SELECT query, doc_id, count(*)::BIGINT AS n_hit_terms,
             CAST(sum(c) AS BIGINT) AS score_milli
      FROM q JOIN contrib USING (term)
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT *, row_number() OVER (PARTITION BY query
                 ORDER BY score_milli DESC, doc_id ASC) AS rank
      FROM scored
    )
    SELECT query, CAST(rank AS INT) AS rank, doc_id, n_hit_terms,
           score_milli
    FROM rk WHERE rank <= {k}
    """


def duckdb_inverted_index_sql(
    table: str = "documents", df_cap: int = POSTING_DF_CAP
) -> str:
    return f"""
    WITH tf AS (
      SELECT word, doc_id, count(*)::BIGINT AS cnt
      FROM (SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS word
            FROM {table})
      GROUP BY 1, 2
    ),
    stats AS (
      SELECT word, count(*)::BIGINT AS df, sum(cnt)::BIGINT AS total_tf
      FROM tf GROUP BY 1
    ),
    postings AS (
      SELECT word,
             string_agg(doc_id || ':' || cnt, ' ' ORDER BY doc_id) AS postings
      FROM tf
      WHERE word IN (SELECT word FROM stats WHERE df <= {df_cap})
      GROUP BY 1
    )
    SELECT s.word, s.df, s.total_tf, coalesce(p.postings, '') AS postings
    FROM stats s LEFT JOIN postings p USING (word)
    """
