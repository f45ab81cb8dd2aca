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
