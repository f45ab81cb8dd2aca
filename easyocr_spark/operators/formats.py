"""Output-format projections — the reference's sink formats.

Reader.recognize's output_format switch (reference
easyocr/easyocr.py:425-438): 'standard' (box, text, confidence)
tuples, 'dict' ({boxes, text, confident}), 'json' strings, and
detail=0 (text only). Here they are pure `select` projections over the
per-box OCR result DataFrame — Catalyst-side, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def format_standard(results: DataFrame) -> DataFrame:
    """(media_ref, result struct<boxes, text, confident>) — the tuple
    shape of the reference's default output."""
    return results.select(
        "media_ref",
        F.struct(
            F.col("boxes").alias("boxes"),
            F.col("text").alias("text"),
            F.col("conf").alias("confident"),
        ).alias("result"),
    )


def format_dict(results: DataFrame) -> DataFrame:
    """Map-typed rows (the reference's output_format='dict')."""
    return results.select(
        "media_ref",
        F.create_map(
            F.lit("text"), F.col("text"),
            F.lit("confident"), F.col("conf").cast("string"),
        ).alias("result"),
    )


def format_json(results: DataFrame) -> DataFrame:
    """JSON-string rows (the reference's output_format='json' uses
    json.dumps per result; here to_json over the struct)."""
    return results.select(
        "media_ref",
        F.to_json(
            F.struct(
                F.col("boxes"), F.col("text"), F.col("conf").alias("confident")
            )
        ).alias("result"),
    )


def format_text_only(results: DataFrame) -> DataFrame:
    """detail=0: just the text strings."""
    return results.select("media_ref", "text")
