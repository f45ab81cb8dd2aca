"""Structured Streaming operators.

The reference is batch-only (SURVEY.md §2.9); the streaming surface here
serves two roles:

1. ``streaming_windowed_counts`` — the streaming twin of the batch
   windowed aggregation (events.windowed_counts), verified against the
   SAME DuckDB oracle: a file-source stream with Trigger.AvailableNow,
   watermark for late data, complete-mode memory sink. Batch/stream
   parity on results is the contract Structured Streaming promises and
   the thing worth testing.
2. ``stream_extract_foreachbatch`` — incremental OCR extraction: each
   micro-batch of newly-arrived documents runs the SAME batch pipeline
   (operators/pipeline.py) inside foreachBatch and appends to the sink;
   Spark's checkpointLocation gives exactly-once file-source progress
   (complementing the explicit per-partition state table of
   state/checkpoint.py, which covers the batch-resume axis).
"""

from __future__ import annotations

import datetime
import os
import re
import shutil
import tempfile
import uuid
from contextlib import contextmanager

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import pipeline

STREAM_SHUFFLE_CAP = 8


@contextmanager
def _clamped_shuffle(spark: SparkSession, cap: int = STREAM_SHUFFLE_CAP):
    """Cap spark.sql.shuffle.partitions for the duration of a streaming
    run (restored after). Every stateful streaming operator materializes
    one state-store instance PER shuffle partition PER micro-batch — at
    local[32] that is 32 store checkpoints per stateful stage for a
    stream whose state fits in one, and the fixed store setup/commit
    cost dominates toy-to-moderate streams. On a real cluster the cap
    is a tuning knob sized to state volume, not a semantic change: the
    partitioning is baked into each query's own fresh checkpoint."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        if int(old) > cap:
            spark.conf.set("spark.sql.shuffle.partitions", str(cap))
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def streaming_windowed_counts(
    spark: SparkSession,
    events_path: str,
    minutes: int = 5,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Run the windowed count as a real streaming query to completion
    (AvailableNow) and return the final result as a batch DataFrame."""
    schema = spark.read.parquet(events_path).schema
    if os.path.isfile(events_path):
        # the file stream source requires a directory
        d = tempfile.mkdtemp(prefix="stream_src_")
        shutil.copy(events_path, os.path.join(d, os.path.basename(events_path)))
        events_path = d
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_path)
        .withColumn("ts_tz", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts_tz", watermark)
        .groupBy(F.window("ts_tz", f"{minutes} minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.floor(F.sum("value") * 1000).cast("long").alias("value_sum_milli"),
        )
    )
    name = f"stream_win_{uuid.uuid4().hex[:8]}"
    with _clamped_shuffle(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = spark.table(name).select(
        F.unix_seconds(F.col("w.start")).alias("window_start_s"),
        "event_type",
        "n",
        "value_sum_milli",
    )
    # materialize before the memory table goes away
    result = out.cache()
    result.count()
    return result


def streaming_windowed_append(
    spark: SparkSession,
    events_path: str,
    out_dir: str,
    checkpoint_dir: str,
    minutes: int = 5,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Append-mode streaming windowed agg written to FILES — the
    bounded-state production shape: a window's state is emitted and
    EVICTED once the watermark passes its end, so state size is bounded
    by the watermark horizon instead of growing with the stream (the
    complete-mode memory-sink twin above retains every window forever —
    fine for parity tests, not at scale).

    Returns the files read back. Contract: the final file contents
    equal the batch windowed aggregation restricted to CLOSED windows
    (window_end <= max(ts) - watermark) — windows still inside the
    watermark horizon when the stream drains are (correctly) unemitted."""
    schema = spark.read.parquet(events_path).schema
    if os.path.isfile(events_path):
        d = tempfile.mkdtemp(prefix="stream_src_")
        shutil.copy(events_path, os.path.join(d, os.path.basename(events_path)))
        events_path = d
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_path)
        .withColumn("ts_tz", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts_tz", watermark)
        .groupBy(F.window("ts_tz", f"{minutes} minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.floor(F.sum("value") * 1000).cast("long").alias("value_sum_milli"),
        )
        .select(
            F.unix_seconds(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n",
            "value_sum_milli",
        )
    )
    with _clamped_shuffle(spark):
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out_dir)


SESSION_GAP_MIN = 30

SESSION_OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, t_start_ms long, "
    "t_end_ms long, value_sum_milli long"
)
SESSION_STATE_SCHEMA = (
    "session_id long, t_start_ms long, t_end_ms long, n_events long, "
    "value_sum double, buf_us array<long>, buf_eid array<long>, "
    "buf_val array<double>"
)


def _make_session_fn(gap_ms: int):
    """Stateful per-user session assembler for applyInPandasWithState.

    State = the user's OPEN session (id, bounds, count, running sum)
    plus a BUFFER of not-yet-sealed events. An event is sealed once the
    watermark passes its timestamp: Spark drops any later arrival below
    the watermark before this operator, so no future row can ever sort
    before a sealed one — folding ONLY sealed events (in ts, event_id
    order) makes the eager fold correct under arbitrary cross-batch
    reordering inside the watermark horizon. Unsealed events wait in
    state (bounded by the watermark horizon per user) until a later
    batch or event-time timeout seals them.

    Emission matches the batch lag+cumsum semantics
    (operators/events.sessionize, gaps on floor-second epochs): a
    session emits when a sealed gap > gap_ms splits it, or when the
    watermark passes its close horizon (t_end + gap). After a close the
    state row stays behind as a TOMBSTONE carrying session_id, so a
    user who reappears in a later micro-batch continues the batch
    numbering instead of restarting at 1 (state size: one small row per
    distinct user ever seen — the same user-cardinality bound as the
    batch sessionize shuffle)."""
    import pandas as pd

    gap_s = gap_ms // 1000

    def fn(key, pdfs, state):
        (user_id,) = key
        wm = state.getCurrentWatermarkMs()
        if state.exists:
            sid, t0, t1, n, vs, b_us, b_eid, b_val = state.get
            buf = list(zip(list(b_us), list(b_eid), list(b_val)))
        else:
            sid, t0, t1, n, vs = 0, None, None, 0, 0.0
            buf = []
        if not state.hasTimedOut:
            frames = list(pdfs)
            rows = pd.concat(frames, ignore_index=True) if frames else None
            if rows is not None and len(rows):
                # microsecond epochs keep the batch (ts, event_id) sort
                # exact even when floor-ms would tie
                ep_us = (
                    rows["ts_tz"].astype("datetime64[ns]").astype("int64") // 1000
                )
                buf.extend(
                    zip(
                        ep_us.tolist(),
                        rows["event_id"].tolist(),
                        rows["value"].astype(float).tolist(),
                    )
                )
        buf.sort()
        out = []
        keep = []
        for t_us, eid, v in buf:
            t_ms = t_us // 1000
            if t_ms >= wm:
                keep.append((t_us, eid, v))
                continue
            # batch semantics: gap on floor-second epochs
            if t0 is None or (t_ms // 1000) - (t1 // 1000) > gap_s:
                if t0 is not None:
                    out.append((user_id, sid, n, t0, t1, int(np.floor(vs * 1000))))
                sid, t0, t1, n, vs = sid + 1, t_ms, t_ms, 1, v
            else:
                t1, n, vs = t_ms, n + 1, vs + v
        if t0 is not None and t1 + gap_ms <= wm:
            # the watermark passed this session's close horizon: every
            # future event (ts >= wm >= t_end + gap) starts a new session
            out.append((user_id, sid, n, t0, t1, int(np.floor(vs * 1000))))
            t0, t1, n, vs = None, None, 0, 0.0
        state.update(
            (
                sid, t0, t1, n, vs,
                [b[0] for b in keep],
                [b[1] for b in keep],
                [b[2] for b in keep],
            )
        )
        horizons = []
        if t0 is not None:
            horizons.append(t1 + gap_ms)
        if keep:
            # wake as soon as the earliest buffered event can seal
            horizons.append(keep[0][0] // 1000 + 1)
        if horizons:
            state.setTimeoutTimestamp(max(min(horizons), wm + 1))
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "session_id", "n_events", "t_start_ms",
                         "t_end_ms", "value_sum_milli"],
            )

    return fn


def streaming_sessionize_stateful(
    spark: SparkSession,
    events_path: str,
    gap_minutes: int = SESSION_GAP_MIN,
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """CUSTOM STATEFUL streaming operator via applyInPandasWithState:
    gap-based sessionization with explicit per-user state and event-time
    timeouts — the operator shape Structured Streaming cannot express
    with built-in aggregations (session windows over ordered gaps with
    exact batch parity).

    Contract: emitted sessions equal the batch sessionize output minus
    each user's LAST session when its close horizon (t_end + gap) is
    still inside the final watermark — the same closed-window discipline
    as the append-mode windowed agg. The contract holds under ARBITRARY
    cross-batch event reordering within the watermark horizon (events
    are buffered in state until the watermark seals them — see
    _make_session_fn; exercised by the shuffled-file-order test with
    max_files_per_trigger=1), and session numbering survives state
    eviction: closed users leave a tombstone carrying their session_id.
    State is bounded: one open session + an in-horizon event buffer per
    active user."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = spark.read.parquet(events_path).schema
    if os.path.isfile(events_path):
        d = tempfile.mkdtemp(prefix="stream_src_")
        shutil.copy(events_path, os.path.join(d, os.path.basename(events_path)))
        events_path = d
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(events_path)
        .withColumn("ts_tz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_tz", watermark)
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_minutes * 60 * 1000),
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    name = f"stream_sess_{uuid.uuid4().hex[:8]}"
    with _clamped_shuffle(spark):
        q = (
            sessions.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    result = spark.table(name).cache()
    result.count()
    return result


def streaming_dedup_exact(
    spark: SparkSession,
    events_path: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming EXACT dedup: the streaming twin of the batch exact-dup
    operator, via ``dropDuplicatesWithinWatermark`` — state holds one
    entry per key only within the watermark horizon (bounded state, the
    production shape; plain dropDuplicates would grow state forever).

    The source feeds every event TWICE in two separate files processed
    as separate micro-batches (maxFilesPerTrigger=1), so duplicates
    must be caught ACROSS batches by the state store, not by in-batch
    distinct. Contract: each event_id is emitted exactly once —
    duplicates inside the horizon hit state and are dropped; duplicates
    arriving after the watermark passed their event time are dropped as
    late rows. Either way the output equals the batch DISTINCT.

    'Equals batch DISTINCT' additionally requires that no event's FIRST
    copy arrives late (a late first copy is dropped entirely and lost
    from the output). With multiple input files the replay therefore
    feeds rep0 in ascending per-file max-event-time order and VALIDATES
    the ordering is sufficient — each file's min ts must clear the
    watermark the preceding files establish — raising loudly (widen the
    watermark) instead of silently losing rows."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    schema = spark.read.parquet(events_path).schema
    d = tempfile.mkdtemp(prefix="stream_dedup_")
    src = os.path.join(d, "src")
    os.makedirs(src)
    base = (
        events_path
        if os.path.isfile(events_path)
        else os.path.join(events_path)
    )
    if os.path.isdir(base):
        files = [
            os.path.join(base, f)
            for f in os.listdir(base)
            if f.endswith(".parquet")
        ]
    else:
        files = [base]
    spans = []
    for f in files:
        ts = pq.read_table(f, columns=["ts"]).column("ts")
        spans.append((pc.max(ts).as_py(), pc.min(ts).as_py(), f))
    spans.sort()  # ascending per-file max event time
    m = re.fullmatch(r"(\d+)\s+(second|minute|hour)s?", watermark.strip())
    if not m:
        raise ValueError(f"unsupported watermark format: {watermark!r}")
    horizon = datetime.timedelta(**{m.group(2) + "s": int(m.group(1))})
    running_max = None
    for mx, mn, f in spans:
        if running_max is not None and mn < running_max - horizon:
            raise ValueError(
                f"streaming_dedup_exact: file {os.path.basename(f)} holds "
                f"events older than the watermark horizon set by earlier "
                f"files (min {mn} < {running_max} - {horizon}); its first "
                "copies would be dropped as late and lost from the output "
                "— widen the watermark"
            )
        running_max = mx if running_max is None else max(running_max, mx)
    now = 1_700_000_000
    for rep in range(2):
        for i, (_, _, f) in enumerate(spans):
            dst = os.path.join(src, f"rep{rep}_{i}.parquet")
            shutil.copy(f, dst)
            now += 10
            os.utime(dst, (now, now))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts_tz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_tz", watermark)
    )
    deduped = stream.dropDuplicatesWithinWatermark(["event_id"])
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    with _clamped_shuffle(spark):
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    result = spark.table(name).select("event_id").cache()
    result.count()
    return result


def streaming_sequence_pack(
    spark: SparkSession,
    docs_path: str,
    seq_len: int = 128,
    n_shards: int = 8,
    n_files: int = 3,
) -> DataFrame:
    """STREAMING sequence packing — the stateful twin of
    text_analysis.sequence_pack: documents arrive incrementally and are
    packed into fixed-length training sequences ON ARRIVAL, with the
    per-shard RUNNING TOKEN OFFSET as the only state (one long per
    shard — the minimum information concat-and-chunk needs; this is
    how a continuous tokenizer pipeline packs shards as crawl data
    lands, instead of re-packing the corpus per batch).

    Order contract: batch packing concatenates per shard in doc_id
    order, so the stream must deliver each shard's documents in
    ascending doc_id across micro-batches. The replay stages the
    corpus as ``n_files`` ascending doc_id ranges with increasing
    mtimes (the file source processes files in mtime order;
    maxFilesPerTrigger=1 makes each range its own micro-batch) and the
    operator sorts within the batch — in production the same contract
    is a monotonically ingested ingest-order key. Contract: emitted
    manifest rows across all micro-batches equal the batch
    sequence_pack output exactly (same oracle — full equality, no
    closed-window subsetting: packing state never expires, it only
    advances)."""
    import pandas as pd
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from pyspark.sql.streaming.state import GroupStateTimeout

    # stage the corpus as ascending doc_id ranges, one file per range
    tbl = pq.read_table(docs_path, columns=["doc_id", "text"])
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")]))
    d = tempfile.mkdtemp(prefix="stream_pack_")
    src = os.path.join(d, "src")
    os.makedirs(src)
    now = 1_700_000_000
    n = len(tbl)
    step = (n + n_files - 1) // n_files
    for i in range(n_files):
        chunk = tbl.slice(i * step, step)
        if not len(chunk):
            continue
        dst = os.path.join(src, f"range{i}.parquet")
        pq.write_table(chunk, dst)
        now += 10
        os.utime(dst, (now, now))

    out_schema = (
        "shard long, seq_id long, doc_id long, doc_tok_start long, "
        "doc_tok_end_excl long"
    )

    def pack_fn(key, pdfs, state):
        (shard,) = key
        off = state.get[0] if state.exists else 0
        frames = [f for f in pdfs]
        rows = pd.concat(frames, ignore_index=True) if frames else None
        out = []
        if rows is not None and len(rows):
            # within-batch order: ascending doc_id (the shard's stream
            # order across batches is the staging contract above)
            rows = rows.sort_values("doc_id")
            for doc_id, n_toks in zip(
                rows["doc_id"].tolist(), rows["n_toks"].tolist()
            ):
                for seq_id in range(off // seq_len, (off + n_toks - 1) // seq_len + 1):
                    out.append(
                        (
                            shard,
                            seq_id,
                            doc_id,
                            max(seq_id * seq_len - off, 0),
                            min((seq_id + 1) * seq_len - off, n_toks),
                        )
                    )
                off += n_toks
        state.update((off,))
        if out:
            yield pd.DataFrame(
                out,
                columns=["shard", "seq_id", "doc_id", "doc_tok_start",
                         "doc_tok_end_excl"],
            )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(
            "doc_id",
            (F.col("doc_id") % n_shards).alias("shard"),
            F.size(F.split(F.lower("text"), r"\s+")).cast("long").alias("n_toks"),
        )
        .filter(F.col("n_toks") > 0)
    )
    packed = stream.groupBy("shard").applyInPandasWithState(
        pack_fn,
        out_schema,
        "next_off long",
        "append",
        GroupStateTimeout.NoTimeout,
    )
    name = f"stream_pack_{uuid.uuid4().hex[:8]}"
    with _clamped_shuffle(spark):
        q = (
            packed.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    result = spark.table(name).cache()
    result.count()
    return result


def stream_extract_foreachbatch(
    spark: SparkSession,
    docs_path: str,
    media: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> int:
    """Incremental extraction over a documents directory: AvailableNow
    file stream -> foreachBatch(batch extract) -> parquet sink.
    Returns number of micro-batches executed. Re-running with the same
    checkpoint_dir processes only files not seen before (exactly-once
    SOURCE progress). foreachBatch itself is at-least-once, so the sink
    write is made idempotent per epoch: output is partitioned by
    batch_id and written with DYNAMIC partition overwrite — a
    micro-batch retried after a partial write overwrites exactly its
    own partition instead of duplicating documents."""
    schema = spark.read.parquet(docs_path).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(docs_path)
    n_batches = {"n": 0}

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        extracted = pipeline.extract_documents(batch_df, media).withColumn(
            "batch_id", F.lit(int(epoch_id))
        )
        (
            extracted.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )
        n_batches["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def streaming_distinct_hll(
    spark: SparkSession,
    events_path: str,
    minutes: int = 5,
    watermark: str = "10 minutes",
) -> DataFrame:
    """STREAMING HyperLogLog: per-window distinct-user estimates where
    the state store holds SKETCH REGISTERS, not users — the streaming
    windowed agg maintains max(rho) per (window, event_type, bucket)
    across micro-batches (state bounded at m=512 rows per group
    regardless of user cardinality; registers merge by max, which is
    exactly what an incremental micro-batch update is), append mode
    emits a window's registers when the watermark closes it, and the
    shared integer-exact fold (operators.events.hll_fold) finalizes the
    estimates batch-side. Contract: equals the batch HLL restricted to
    closed windows (duckdb_streaming_hll_sql)."""
    from ..operators import events as ev

    schema = spark.read.parquet(events_path).schema
    if os.path.isfile(events_path):
        d = tempfile.mkdtemp(prefix="stream_src_")
        shutil.copy(events_path, os.path.join(d, os.path.basename(events_path)))
        events_path = d
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_path)
        .withColumn("ts_tz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_tz", watermark)
    )
    bucket, rho = ev.hll_register_cols()
    regs = (
        stream.select(
            "ts_tz", "event_type", bucket.alias("bucket"), rho.alias("rho")
        )
        .groupBy(
            F.window("ts_tz", f"{minutes} minutes").alias("w"),
            "event_type",
            "bucket",
        )
        .agg(F.max("rho").alias("m_rho"))
    )
    name = f"stream_hll_{uuid.uuid4().hex[:8]}"
    with _clamped_shuffle(spark):
        q = (
            regs.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    emitted = spark.table(name).select(
        F.unix_seconds(F.col("w.start")).alias("window_start_s"),
        "event_type",
        "bucket",
        "m_rho",
    )
    result = ev.hll_fold(emitted, ["window_start_s", "event_type"]).cache()
    result.count()
    return result
