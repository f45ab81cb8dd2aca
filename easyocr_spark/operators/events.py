"""Event-stream operators in batch form (sessionization, windowed aggs).

The reference has no streaming semantics (SURVEY.md §2.9); these are the
batch twins of the Structured Streaming operators in streaming/ — same
logical results, verified against DuckDB window-function oracles. The
streaming module reuses the same windowing contract with watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30
WINDOW_MIN = 5


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessionization per user: the lag + cumulative-sum
    pattern (one shuffle on user_id; the window sort rides the same
    partitioning). Output: per-session stats."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ in the parquet; Spark 4 refuses a direct cast
    # to long — hop via timestamp (session tz pinned UTC = DuckDB epoch())
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    with_session = (
        events.withColumn("gap_s", gap)
        .withColumn(
            "new_session",
            F.when(
                F.col("gap_s").isNull() | (F.col("gap_s") > gap_minutes * 60), 1
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(w))
    )
    return with_session.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.unix_millis(F.min(F.col("ts").cast("timestamp"))).alias("t_start_ms"),
        F.unix_millis(F.max(F.col("ts").cast("timestamp"))).alias("t_end_ms"),
        F.floor(F.sum("value") * 1000).cast("long").alias("value_sum_milli"),
    )


def duckdb_sessionize_sql(gap_minutes: int = SESSION_GAP_MIN) -> str:
    # floor(epoch(...)) everywhere: DuckDB's epoch() is a fractional
    # DOUBLE and a bare ::BIGINT cast ROUNDS, which would disagree with
    # Spark's truncating timestamp->long cast at sub-second boundaries
    return f"""
    WITH g AS (
      SELECT *, CAST(floor(epoch(ts)) AS BIGINT)
                - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
      FROM events
    ),
    s AS (
      SELECT *, CAST(sum(CASE WHEN gap_s IS NULL OR gap_s > {gap_minutes * 60}
                         THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
               AS session_id
      FROM g
    )
    SELECT user_id, session_id, count(*) AS n_events,
           epoch_ms(min(ts)) AS t_start_ms, epoch_ms(max(ts)) AS t_end_ms,
           CAST(floor(sum(value) * 1000) AS BIGINT) AS value_sum_milli
    FROM s GROUP BY 1, 2
    """


def windowed_counts(events: DataFrame, minutes: int = WINDOW_MIN) -> DataFrame:
    """Tumbling-window counts per event_type (the batch twin of the
    streaming windowed agg). Window start exported as epoch seconds so
    the oracle compares integers, not timestamps."""
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.floor(F.sum("value") * 1000).cast("long").alias("value_sum_milli"),
        )
        .select(
            F.col("w.start").cast("timestamp").cast("long").alias("window_start_s"),
            "event_type",
            "n",
            "value_sum_milli",
        )
    )


def duckdb_windowed_sql(minutes: int = WINDOW_MIN) -> str:
    secs = minutes * 60
    return f"""
    SELECT (CAST(floor(epoch(ts)) AS BIGINT) // {secs}) * {secs} AS window_start_s,
           event_type, count(*) AS n,
           CAST(floor(sum(value) * 1000) AS BIGINT) AS value_sum_milli
    FROM events GROUP BY 1, 2
    """


def duckdb_sessionize_closed_sql(
    gap_minutes: int = SESSION_GAP_MIN, watermark_s: int = 600
) -> str:
    """Oracle for the STATEFUL streaming sessionizer: the batch
    sessions minus each user's last session when its close horizon
    (t_end + gap) has not fallen behind the final watermark — the
    still-open state that correctly never emits on a drained stream."""
    gap_ms = gap_minutes * 60 * 1000
    wm_ms = watermark_s * 1000
    return f"""
    WITH b AS ({duckdb_sessionize_sql(gap_minutes)}),
    m AS (SELECT epoch_ms(max(ts)) AS mt FROM events),
    lastx AS (SELECT user_id, max(session_id) AS max_sid FROM b GROUP BY 1)
    SELECT b.user_id, b.session_id, b.n_events, b.t_start_ms, b.t_end_ms,
           b.value_sum_milli
    FROM b JOIN lastx USING (user_id), m
    WHERE NOT (b.session_id = lastx.max_sid
               AND b.t_end_ms + {gap_ms} >= m.mt - {wm_ms})
    """


def duckdb_windowed_append_sql(
    minutes: int = WINDOW_MIN, watermark_s: int = 600
) -> str:
    """Oracle for the append-mode streaming windowed agg: the batch
    windowed counts restricted to CLOSED windows — window_end <=
    max(ts) - watermark. Windows still inside the watermark horizon
    when the finite stream drains are unemitted by append mode."""
    secs = minutes * 60
    return f"""
    WITH w AS ({duckdb_windowed_sql(minutes)}),
    m AS (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS mt FROM events)
    SELECT w.* FROM w, m WHERE w.window_start_s + {secs} <= m.mt - {watermark_s}
    """


def asof_prior_event(
    events: DataFrame, probe_type: str = "click", ref_type: str = "view"
) -> DataFrame:
    """As-of join within one stream: for each ``probe_type`` event,
    the timestamp of the latest earlier-or-equal ``ref_type`` event by
    the same user. Spark lacks a native as-of join (guide §patterns);
    the scalable formulation is a single window pass — carry the last
    ref-event timestamp forward over the user's timeline (one shuffle
    on user_id, no range self-join blow-up)."""
    epoch_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = events.withColumn(
        "prior_ref_ms",
        F.last(
            F.when(F.col("event_type") == ref_type, epoch_ms), ignorenulls=True
        ).over(w),
    )
    return carried.filter(F.col("event_type") == probe_type).select(
        "event_id",
        "user_id",
        epoch_ms.alias("ts_ms"),
        F.coalesce("prior_ref_ms", F.lit(-1)).alias("prior_view_ms"),
    )


def duckdb_asof_sql(probe_type: str = "click", ref_type: str = "view") -> str:
    return f"""
    WITH carried AS (
      SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms,
             last_value(CASE WHEN event_type = '{ref_type}'
                             THEN epoch_ms(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prior_ref_ms
      FROM events
    )
    SELECT event_id, user_id, ts_ms,
           coalesce(prior_ref_ms, -1) AS prior_view_ms
    FROM carried WHERE event_type = '{probe_type}'
    """


def top_event_types(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k event types per user by count — the top-k-per-group
    pattern (partial agg + window)."""
    counts = events.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("user_id", "event_type", "n", "rank")
    )


def duckdb_top_event_types_sql(k: int = 3) -> str:
    return f"""
    WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2),
    r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY n DESC, event_type ASC) AS rank
          FROM c)
    SELECT user_id, event_type, n, CAST(rank AS INT) AS rank FROM r WHERE rank <= {k}
    """
