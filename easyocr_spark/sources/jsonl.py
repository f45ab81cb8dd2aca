"""JSONL source/sink for the documents table.

JSON-Lines is THE interchange format of web-scale text pipelines
(Common Crawl derivatives, Dolma, RedPajama all ship .jsonl[.gz]); an
engine claiming to run a training-data pipeline must ingest and emit
it, not just parquet. Spark's native json source/sink is used — it is
distributed and splittable for uncompressed files (one task per input
split; gzip members are per-file parallel), and the read side always
passes an EXPLICIT schema: schema inference triggers a full extra scan
of the data before the real job, which at 100 TB doubles the read.

The round-trip contract is verified by the `source_jsonl_roundtrip`
oracle: documents written to JSONL by Spark and read back must equal
the parquet table byte-for-byte (DuckDB reads the parquet side
directly; text content compared via md5).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = "doc_id long, text string"


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    """Write (doc_id, text) rows as JSON-Lines. One file per partition
    — at scale, .repartition(n) upstream controls shard count/size the
    same way tokenizer pipelines size their .jsonl shards."""
    docs.select("doc_id", "text").write.mode("overwrite").json(path)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a documents JSONL directory with the explicit schema (no
    inference scan). Corrupt lines surface as nulls under the default
    PERMISSIVE mode; FAILFAST is the production setting for a curated
    corpus and is what we pin here so silent data loss is impossible."""
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("mode", "FAILFAST")
        .json(path)
    )


def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle query body: parquet documents -> Spark JSONL sink ->
    Spark JSONL source -> (doc_id, text_md5, n_chars). The DuckDB twin
    reads the PARQUET table directly, so any content drift introduced
    by the JSON encode/decode (escaping, unicode, nulls) breaks the
    hash match."""
    from .tables import CACHE_ROOT, read_table

    docs = read_table(spark, sf_dir, "documents")
    path = os.path.join(
        CACHE_ROOT,
        "jsonl_roundtrip_" + os.path.basename(os.path.normpath(sf_dir)),
    )
    write_documents_jsonl(docs, path)
    back = read_documents_jsonl(spark, path)
    return back.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.length("text").alias("n_chars"),
    )
