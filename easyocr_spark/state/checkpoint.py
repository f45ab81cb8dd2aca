"""Resumable extraction with a per-partition state table (axis B).

The north rule requires the 10^12-doc job to checkpoint per-partition
progress with lineage + metrics to an Iceberg state table and resume
idempotently. The design (SURVEY.md §4.3):

- the doc space is split into WORK UNITS by a stable hash of doc_id
  (``unit_id = pmod(xxhash64(doc_id), n_units)``) — stable across runs
  and independent of physical file layout, so a resume after the input
  gained files still maps docs to the same unit.
- one Spark job processes ALL todo units (an anti-join of unit ids
  against state rows with status='done') — resume is a filter, not a
  driver-side loop, so the cluster stays fully utilized regardless of
  how many units remain.
- output is written partitioned by unit_id with DYNAMIC partition
  overwrite: a crash between data write and state write makes the
  rerun overwrite exactly those partitions — idempotent, no dupes.
- the state row carries lineage (input snapshot id — here a
  deterministic fingerprint of the input file listing; in production
  the Iceberg snapshot id) and extraction metrics per unit.

Parquet stands in for Iceberg (no Iceberg jars in the sandbox); the
commit protocol is the same shape: data commit, then state append, and
recovery keyed off the state table only.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import pipeline

STATE_SCHEMA = (
    "unit_id int, status string, docs_done long, spans_done long, "
    "media_spans_done long, t_start double, t_end double, "
    "input_snapshot_id string, run_id string"
)


def input_snapshot_id(path: str) -> str:
    """Deterministic lineage id for a parquet input dir (stand-in for an
    Iceberg snapshot id): fingerprint of the sorted (name, size, mtime)
    listing."""
    import hashlib

    h = hashlib.sha256()
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            st = os.stat(os.path.join(path, name))
            h.update(f"{name}:{st.st_size}:{int(st.st_mtime)}".encode())
    else:
        st = os.stat(path)
        h.update(f"{path}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]


def read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    if os.path.exists(state_dir) and any(
        f.endswith(".parquet") for f in os.listdir(state_dir)
    ):
        return spark.read.parquet(state_dir)
    return spark.createDataFrame([], STATE_SCHEMA)


def done_units(
    spark: SparkSession, state_dir: str, snapshot_id: str | None = None
) -> list[int]:
    """Units already extracted FOR THE CURRENT INPUT SNAPSHOT.

    Filtering on input_snapshot_id (not just status) enforces lineage:
    if the input gained files since a unit was marked done, new docs
    hashing into that unit would otherwise be skipped forever. A 'done'
    recorded under a stale snapshot does not count — those units rerun
    and their output partitions are overwritten idempotently."""
    state = read_state(spark, state_dir)
    cond = F.col("status") == "done"
    if snapshot_id is not None:
        cond = cond & (F.col("input_snapshot_id") == snapshot_id)
    return [
        r.unit_id
        for r in state.filter(cond).select("unit_id").distinct().collect()
    ]


def run_extraction(
    spark: SparkSession,
    docs: DataFrame,
    media: DataFrame,
    out_dir: str,
    state_dir: str,
    n_units: int = 32,
    snapshot_id: str = "",
    run_id: str | None = None,
    decoder: str = "greedy",
    allowlist: str | None = None,
) -> dict:
    """Process all not-yet-done units; returns run metrics.

    Safe to re-run after any crash: finished units are skipped via the
    state anti-join; partially written units are overwritten (dynamic
    partition overwrite on unit_id).
    """
    run_id = run_id or f"run_{int(time.time() * 1000)}"
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    done = done_units(spark, state_dir, snapshot_id)
    t0 = time.time()

    with_unit = docs.withColumn(
        "unit_id", F.pmod(F.xxhash64("doc_id"), F.lit(n_units)).cast("int")
    )
    todo = with_unit.filter(~F.col("unit_id").isin(done)) if done else with_unit
    if todo.isEmpty():
        return {"run_id": run_id, "units_processed": 0, "docs": 0}

    extracted = pipeline.extract_documents(
        todo.drop("unit_id"), media, decoder=decoder, allowlist=allowlist
    )
    out = extracted.withColumn(
        "unit_id", F.pmod(F.xxhash64("doc_id"), F.lit(n_units)).cast("int")
    )
    out.write.mode("overwrite").partitionBy("unit_id").parquet(out_dir)

    # metrics per unit from the committed output (reading back what was
    # written = the metrics describe the actual committed data)
    written = spark.read.parquet(out_dir).filter(
        ~F.col("unit_id").isin(done) if done else F.lit(True)
    )
    t1 = time.time()
    metrics = (
        written.select(
            "unit_id",
            F.size("spans").alias("n_spans"),
            F.size(F.filter("spans", lambda s: s["kind"] == F.lit("media"))).alias(
                "n_media"
            ),
        )
        .groupBy("unit_id")
        .agg(
            F.count("*").alias("docs_done"),
            F.sum("n_spans").alias("spans_done"),
            F.sum("n_media").alias("media_spans_done"),
        )
        .select(
            "unit_id",
            F.lit("done").alias("status"),
            "docs_done",
            "spans_done",
            "media_spans_done",
            F.lit(t0).alias("t_start"),
            F.lit(t1).alias("t_end"),
            F.lit(snapshot_id).alias("input_snapshot_id"),
            F.lit(run_id).alias("run_id"),
        )
    )
    # one pass: the per-unit agg is collected (tiny: one row per unit),
    # the state append writes from the local rows, and the run totals
    # derive from the same rows — no re-execution of the agg and no
    # second scan of the committed output.
    rows = metrics.collect()
    spark.createDataFrame(rows, metrics.schema).coalesce(1).write.mode(
        "append"
    ).parquet(state_dir)
    return {
        "run_id": run_id,
        "units_processed": len(rows),
        "docs": int(sum(r.docs_done for r in rows)),
    }
