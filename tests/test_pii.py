from __future__ import annotations

import hashlib

import pandas as pd

from easyocr_spark.operators import pii


def _scan(spark, rows):
    docs = spark.createDataFrame(pd.DataFrame(rows))
    return (
        pii.pii_scan(docs).toPandas().set_index("doc_id").sort_index()
    )


def test_injection_types_and_clean_control(spark):
    """doc_id % 4 routes the synthetic block: 0 stays clean, 1 gets an
    email, 2 a phone, 3 an ipv4 — and each detector fires exactly on
    its own class."""
    out = _scan(
        spark,
        {"doc_id": [0, 1, 2, 3], "text": ["plain words"] * 4},
    )
    assert out.loc[0, ["n_emails", "n_ips", "n_phones", "pii_total"]].tolist() == [
        0,
        0,
        0,
        0,
    ]
    assert out.loc[1, "n_emails"] == 1 and out.loc[1, "pii_total"] == 1
    assert out.loc[2, "n_phones"] == 1 and out.loc[2, "pii_total"] == 1
    assert out.loc[3, "n_ips"] == 1 and out.loc[3, "pii_total"] == 1


def test_clean_doc_md5_is_identity(spark):
    """A clean control doc's redacted_md5 equals md5 of its original
    text — redaction never touches PII-free input."""
    out = _scan(spark, {"doc_id": [0], "text": ["no secrets here"]})
    assert out.loc[0, "redacted_md5"] == hashlib.md5(
        b"no secrets here"
    ).hexdigest()


def test_natural_pii_detected_without_injection(spark):
    """PII already present in the text body is found too (the detector
    is corpus-agnostic; injection only supplies positives on the
    synthetic corpus). doc_id=0 -> no augmentation."""
    out = _scan(
        spark,
        {
            "doc_id": [0],
            "text": ["mail bob@host.org or 555-1234 from 192.168.0.1 now"],
        },
    )
    row = out.loc[0]
    assert (
        row.n_emails == 1 and row.n_phones == 1 and row.n_ips == 1
    ), row.to_dict()
    redacted = "mail <EMAIL> or <PHONE> from <IP> now"
    assert row.redacted_md5 == hashlib.md5(redacted.encode()).hexdigest()


def test_redaction_masks_injected_block(spark):
    """The injected email for doc_id=1 is masked: the redacted text
    (reconstructed here) hashes to redacted_md5."""
    out = _scan(spark, {"doc_id": [1], "text": ["t"]})
    redacted = "t contact <EMAIL> for details."
    assert out.loc[1, "redacted_md5"] == hashlib.md5(
        redacted.encode()
    ).hexdigest()


def test_plan_is_narrow(spark):
    """No Exchange anywhere — the scan+redact is a single narrow
    projection that scales with input splits."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a", "b"]})
    )
    plan = pii.pii_scan(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
