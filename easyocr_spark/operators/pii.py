"""PII detection + redaction for training-data pipelines.

A web-scale corpus pipeline must find and mask personally identifying
strings (emails, phone numbers, IP addresses) before training. The
detector/redactor here is pure JVM-side regex codegen — one narrow
projection, zero shuffles, zero Python — so it scales with input
splits exactly like a parquet scan.

The synthetic test corpus (word-soup ``documents``) contains no natural
PII, so the query deterministically AUGMENTS a subset of docs with
synthetic contact blocks derived from ``doc_id`` (``doc_id % 4`` picks
the PII type; 1/4 of docs stay clean as negative controls). The DuckDB
oracle performs the identical augmentation, so detection counts AND the
md5 of the fully redacted text are compared bit-for-bit. The
detect/redact body itself is corpus-agnostic — on real data, drop the
augmentation and run the same projection.

Regex portability: the three patterns use only character classes,
bounded repetition and ``\\b`` word boundaries — identical semantics in
Java (Spark) and RE2 (DuckDB). DuckDB's ``regexp_replace`` needs the
explicit ``'g'`` flag to match Spark's replace-all default.

Reference parity note: EasyOCR's pipeline has no PII stage (its output
is OCR text, easyocr/easyocr.py:385-465); this operator is part of the
training-data surface the round brief adds on top of the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\b[0-9]{3}-[0-9]{4}\b"

EMAIL_TAG = "<EMAIL>"
IP_TAG = "<IP>"
PHONE_TAG = "<PHONE>"


def _augmented(docs: DataFrame) -> DataFrame:
    """text || deterministic synthetic PII block keyed on doc_id % 4
    (1=email, 2=phone, 3=ipv4, 0=clean control). Materialized in its
    own select so the three extracts + the redact chain reference one
    computed column, not four copies of the concat."""
    ds = F.col("doc_id").cast("string")
    injected = (
        F.when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit(" contact alice"), ds, F.lit("@example.com for details.")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" today."),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 3,
            F.concat(
                F.lit(" server 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit("."),
                (F.floor(F.col("doc_id") / 7) % 256).cast("string"),
                F.lit(".1 online."),
            ),
        )
        .otherwise(F.lit(""))
    )
    return docs.select("doc_id", F.concat(F.col("text"), injected).alias("aug"))


def pii_scan(docs: DataFrame) -> DataFrame:
    """Per-doc PII counts + md5 of the fully redacted text.

    Redaction order is part of the contract (email, then ip, then
    phone) — the patterns are mutually exclusive on this corpus but a
    fixed order keeps the md5 well-defined if they ever overlap.
    Output: (doc_id, n_emails, n_ips, n_phones, pii_total,
    redacted_md5)."""
    aug = _augmented(docs)
    a = F.col("aug")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(a, EMAIL_RE, EMAIL_TAG), IP_RE, IP_TAG
        ),
        PHONE_RE,
        PHONE_TAG,
    )
    n_emails = F.size(F.regexp_extract_all(a, F.lit(EMAIL_RE), 0))
    n_ips = F.size(F.regexp_extract_all(a, F.lit(IP_RE), 0))
    n_phones = F.size(F.regexp_extract_all(a, F.lit(PHONE_RE), 0))
    return aug.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
        (n_emails + n_ips + n_phones).cast("long").alias("pii_total"),
        F.md5(redacted).alias("redacted_md5"),
    )


def duckdb_pii_sql(table: str = "documents") -> str:
    return f"""
    WITH aug AS (
      SELECT doc_id,
             text || CASE doc_id % 4
               WHEN 1 THEN ' contact alice' || CAST(doc_id AS VARCHAR)
                           || '@example.com for details.'
               WHEN 2 THEN ' call 555-'
                           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           || ' today.'
               WHEN 3 THEN ' server 10.' || CAST(doc_id % 256 AS VARCHAR)
                           || '.' || CAST((doc_id // 7) % 256 AS VARCHAR)
                           || '.1 online.'
               ELSE ''
             END AS aug
      FROM {table}
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(aug, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(aug, '{IP_RE}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(aug, '{PHONE_RE}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(aug, '{EMAIL_RE}'))
                + len(regexp_extract_all(aug, '{IP_RE}'))
                + len(regexp_extract_all(aug, '{PHONE_RE}')) AS BIGINT) AS pii_total,
           md5(regexp_replace(
                 regexp_replace(
                   regexp_replace(aug, '{EMAIL_RE}', '{EMAIL_TAG}', 'g'),
                   '{IP_RE}', '{IP_TAG}', 'g'),
                 '{PHONE_RE}', '{PHONE_TAG}', 'g')) AS redacted_md5
    FROM aug
    """
