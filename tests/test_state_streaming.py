"""Resume (axis B) + streaming tests."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from easyocr_spark.operators import events, pipeline
from easyocr_spark.sources import tables
from easyocr_spark.state import checkpoint
from easyocr_spark.streaming import stream

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tmpdirs(tmp_path):
    return str(tmp_path / "out"), str(tmp_path / "state"), str(tmp_path / "ckpt")


@pytest.fixture(scope="module")
def docs(spark):
    # a small slice keeps the OCR work light while covering all classes
    return tables.interleaved_documents(spark, SF).filter(
        F.col("doc_id").isin([f"doc_{i}" for i in range(120)])
    ).cache()


@pytest.fixture(scope="module")
def media(spark):
    return tables.media_table(spark, SF)


def test_run_then_resume_noop(spark, docs, media, tmpdirs):
    out_dir, state_dir, _ = tmpdirs
    snap = checkpoint.input_snapshot_id(SF)
    r1 = checkpoint.run_extraction(
        spark, docs, media, out_dir, state_dir, n_units=8, snapshot_id=snap
    )
    assert r1["units_processed"] == 8
    assert r1["docs"] == docs.count()
    # second run: everything done -> no work
    r2 = checkpoint.run_extraction(
        spark, docs, media, out_dir, state_dir, n_units=8, snapshot_id=snap
    )
    assert r2["units_processed"] == 0
    result = spark.read.parquet(out_dir)
    assert result.count() == docs.count()
    assert result.select("doc_id").distinct().count() == docs.count()
    state = spark.read.parquet(state_dir)
    assert state.filter(F.col("status") == "done").count() == 8
    assert state.select("input_snapshot_id").distinct().collect()[0][0] == snap


def test_resume_after_partial_failure(spark, docs, media, tmpdirs):
    """Simulate a crash: only some units' state committed. Rerun must
    process exactly the rest, and the final output must be complete
    with no duplicates."""
    out_dir, state_dir, _ = tmpdirs
    r1 = checkpoint.run_extraction(spark, docs, media, out_dir, state_dir, n_units=8)
    assert r1["units_processed"] == 8
    # forge a crash: drop state rows for 3 units (data stays on disk —
    # the rerun must overwrite those partitions idempotently)
    state = spark.read.parquet(state_dir).cache()
    state.count()
    kept = state.filter(F.col("unit_id") >= 3)
    shutil.rmtree(state_dir)
    kept.write.mode("overwrite").parquet(state_dir)
    r2 = checkpoint.run_extraction(spark, docs, media, out_dir, state_dir, n_units=8)
    assert r2["units_processed"] == 3
    result = spark.read.parquet(out_dir)
    assert result.count() == docs.count()
    assert result.select("doc_id").distinct().count() == docs.count()


def test_streaming_windowed_matches_batch(spark):
    ev_path = os.path.join(SF, "events.parquet")
    got = stream.streaming_windowed_counts(spark, ev_path)
    batch = events.windowed_counts(spark.read.parquet(ev_path))
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
    got.unpersist()


def test_streaming_foreachbatch_incremental(spark, docs, media, tmpdirs):
    out_dir, _, ckpt = tmpdirs
    src = os.path.join(ckpt, "src")
    docs.limit(40).write.mode("overwrite").parquet(src)
    n1 = stream.stream_extract_foreachbatch(spark, src, media, out_dir, ckpt + "/c")
    assert n1 >= 1
    count1 = spark.read.parquet(out_dir).count()
    # re-run with same checkpoint: no new files -> no new batches
    n2 = stream.stream_extract_foreachbatch(spark, src, media, out_dir, ckpt + "/c")
    assert spark.read.parquet(out_dir).count() == count1


def test_streaming_append_matches_closed_windows(spark, tmp_path):
    ev_path = os.path.join(SF, "events.parquet")
    got = stream.streaming_windowed_append(
        spark, ev_path, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    ev = spark.read.parquet(ev_path)
    max_ts = ev.select(
        F.max(F.unix_seconds(F.col("ts").cast("timestamp")))
    ).collect()[0][0]
    closed = events.windowed_counts(ev).filter(
        F.col("window_start_s") + 300 <= max_ts - 600
    )
    assert got.exceptAll(closed).count() == 0
    assert closed.exceptAll(got).count() == 0
    # bounded state: some open windows must exist and be unemitted
    assert events.windowed_counts(ev).count() > got.count()


def test_stateful_sessionize_shuffled_file_order(spark, tmp_path):
    """Cross-batch event reordering inside the watermark horizon + state
    eviction mid-stream must not change the result.

    Deterministic corpus: user 1 pauses 3600s (> gap) while user 2 keeps
    the watermark advancing, so user 1's open session is closed by
    EVENT-TIME TIMEOUT mid-stream — its later events must continue the
    batch session numbering (the tombstone contract). Files: each 300s
    block of the timeline is split into two interleaved halves fed in
    REVERSED order with maxFilesPerTrigger=1, so a user's events arrive
    out of event-time order across micro-batches (bounded by the block
    span, 300s < the 600s watermark — nothing is late-dropped). The
    pre-buffering eager fold produced garbage sessions on exactly this
    input."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.Timestamp("2024-03-01")
    rows = []
    # user 1: session, 3600s pause (mid-stream timeout eviction), then a
    # SECOND session that also closes and emits before the stream ends —
    # a sid reset after eviction would emit it as a colliding session 1
    rows += [(1, t) for t in range(0, 1201, 60)]
    rows += [(1, t) for t in range(4800, 5001, 60)]
    # user 2: continuous — keeps the watermark moving during the pauses
    rows += [(2, t) for t in range(30, 7891, 60)]
    # user 3: session, pause, still-open trailing session (withheld)
    rows += [(3, t) for t in range(15, 2956, 60)]
    rows += [(3, t) for t in range(5400, 5941, 60)]
    rows.sort(key=lambda r: (r[1], r[0]))
    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "user_id": [u for u, _ in rows],
            "ts": [base + pd.Timedelta(seconds=t) for _, t in rows],
            "event_type": ["click"] * len(rows),
            "value": [(i % 7) * 0.25 for i in range(len(rows))],
        }
    )
    src = tmp_path / "ev_src"
    src.mkdir()
    pdf["block"] = [t // 300 for _, t in rows]
    mtime = 1_700_000_000
    for blk in sorted(pdf["block"].unique()):
        part = pdf[pdf["block"] == blk].drop(columns=["block"])
        # interleaved halves, LATER-arriving half fed first
        for tag, half in (("b", part.iloc[1::2]), ("a", part.iloc[0::2])):
            if not len(half):
                continue
            f = src / f"blk{blk:03d}_{tag}.parquet"
            pq.write_table(
                pa.Table.from_pandas(half, preserve_index=False),
                f,
                coerce_timestamps="us",  # Spark rejects TIMESTAMP(NANOS)
            )
            mtime += 10
            os.utime(f, (mtime, mtime))
    # ~53 one-file micro-batches: shrink the per-batch state-store cost
    # (32 partitions x 53 commits) — 3 users only need a few partitions
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        got = stream.streaming_sessionize_stateful(
            spark, str(src), max_files_per_trigger=1
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    ev = spark.read.parquet(str(src))
    batch = events.sessionize(ev)
    mt_ms = ev.select(
        F.max(F.unix_millis(F.col("ts").cast("timestamp")))
    ).collect()[0][0]
    from pyspark.sql import Window

    last = batch.withColumn(
        "max_sid", F.max("session_id").over(Window.partitionBy("user_id"))
    )
    closed = last.filter(
        ~(
            (F.col("session_id") == F.col("max_sid"))
            & (F.col("t_end_ms") + 1800_000 >= mt_ms - 600_000)
        )
    ).drop("max_sid")
    assert got.count() >= 3  # u1 sessions 1+2 and u3 session 1 closed
    assert got.exceptAll(closed).count() == 0
    assert closed.exceptAll(got).count() == 0
    # numbering survived the mid-stream eviction: user 1's post-pause
    # session emits as 2, not a colliding restart at 1
    u1 = sorted(r.session_id for r in got.collect() if r.user_id == 1)
    assert u1 == [1, 2]
    got.unpersist()


def test_stateful_sessionize_matches_closed_batch_sessions(spark):
    ev_path = os.path.join(SF, "events.parquet")
    got = stream.streaming_sessionize_stateful(spark, ev_path)
    ev = spark.read.parquet(ev_path)
    batch = events.sessionize(ev)
    mt_ms = ev.select(
        F.max(F.unix_millis(F.col("ts").cast("timestamp")))
    ).collect()[0][0]
    from pyspark.sql import Window

    last = batch.withColumn(
        "max_sid", F.max("session_id").over(Window.partitionBy("user_id"))
    )
    closed = last.filter(
        ~(
            (F.col("session_id") == F.col("max_sid"))
            & (F.col("t_end_ms") + 1800_000 >= mt_ms - 600_000)
        )
    ).drop("max_sid")
    assert got.exceptAll(closed).count() == 0
    assert closed.exceptAll(got).count() == 0
    got.unpersist()


def test_streaming_dedup_exact_across_batches(spark):
    """Every event fed twice in separate micro-batches comes out once:
    in-horizon duplicates die against the state store, out-of-horizon
    ones as late rows — output equals the batch DISTINCT either way."""
    ev_path = os.path.join(SF, "events.parquet")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        got = stream.streaming_dedup_exact(spark, ev_path)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    batch = spark.read.parquet(ev_path).select("event_id").distinct()
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0
    got.unpersist()


def test_streaming_dedup_rejects_late_first_copies(spark, tmp_path):
    """ADVICE r3: a multi-file source whose max-ts ordering still leaves
    one file's events older than the watermark horizon established by
    earlier files would silently LOSE those events' first copies as late
    rows — the replay must refuse loudly instead."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = pd.Timestamp("2024-05-01")
    d = tmp_path / "ev"
    d.mkdir()

    def write(name, offsets_s, ids):
        pdf = pd.DataFrame(
            {
                "event_id": ids,
                "user_id": [1] * len(ids),
                "event_type": ["a"] * len(ids),
                "value": [1.0] * len(ids),
                "ts": [t0 + pd.Timedelta(seconds=s) for s in offsets_s],
            }
        )
        pq.write_table(
            pa.Table.from_pandas(pdf), str(d / name),
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )

    # fileA spans [0, 3600]; fileB sits at [1800] only. Sorted by max ts
    # B comes first, then A — whose min (0s) is older than B's max
    # (1800s) minus the 10-minute horizon -> first copies would be late.
    write("a.parquet", [0, 3600], [1, 2])
    write("b.parquet", [1800], [3])
    with pytest.raises(ValueError, match="late"):
        stream.streaming_dedup_exact(spark, str(d), watermark="10 minutes")
    # a wide-enough watermark makes the same layout safe and lossless
    got = stream.streaming_dedup_exact(spark, str(d), watermark="2 hours")
    assert sorted(r.event_id for r in got.collect()) == [1, 2, 3]
    got.unpersist()


def test_streaming_hll_registers_match_batch_closed_windows(spark):
    """The streaming sketch's emitted registers, folded with the shared
    estimator, must equal the batch HLL restricted to closed windows —
    register-max merging across micro-batches is the whole claim."""
    import duckdb

    from easyocr_spark.operators import events as E

    ev_path = os.path.join(SF, "events.parquet")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        got = stream.streaming_distinct_hll(spark, ev_path)
        pdf = got.toPandas().sort_values(
            ["window_start_s", "event_type"]
        ).reset_index(drop=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{ev_path}'")
    want = con.execute(E.duckdb_streaming_hll_sql()).fetchdf().sort_values(
        ["window_start_s", "event_type"]
    ).reset_index(drop=True)
    cols = ["window_start_s", "event_type", "est_distinct"]
    casts = {"window_start_s": "int64", "est_distinct": "int64"}
    assert pdf[cols].astype(casts).equals(want[cols].astype(casts))
    got.unpersist()


def test_streaming_sequence_pack_offsets_cross_batches(spark, tmp_path):
    """The packing state (per-shard running token offset) must carry
    ACROSS micro-batches: a document arriving in a later file continues
    the sequence its shard-mates opened earlier — equal to the batch
    concat-and-chunk, not a per-batch restart."""
    import pandas as pd

    from easyocr_spark.operators import text_analysis as ta

    # one shard (all doc_id % 8 == 1): 6 + 5 + 9 tokens, seq_len 8.
    # doc 9 straddles seq 0/1 across the FIRST file boundary; doc 17
    # (second file) must continue at offset 11 -> seqs 1 and 2.
    pdf = pd.DataFrame({
        "doc_id": [1, 9, 17],
        "text": [
            " ".join(f"a{i}" for i in range(6)),
            " ".join(f"b{i}" for i in range(5)),
            " ".join(f"c{i}" for i in range(9)),
        ],
    })
    docs_path = str(tmp_path / "docs.parquet")
    pdf.to_parquet(docs_path)
    got = stream.streaming_sequence_pack(
        spark, docs_path, seq_len=8, n_shards=8, n_files=2
    )
    got_rows = set(map(tuple, got.toPandas().itertuples(index=False)))
    batch = ta.sequence_pack(
        spark.createDataFrame(pdf), seq_len=8, n_shards=8
    )
    batch_rows = set(map(tuple, batch.toPandas().itertuples(index=False)))
    assert got_rows == batch_rows
    # the cross-batch continuation specifically: doc 17 starts at
    # offset 11 (6+5), inside seq 1, and spills into seq 2
    assert (1, 1, 17, 0, 5) in got_rows and (1, 2, 17, 5, 9) in got_rows
    got.unpersist()
