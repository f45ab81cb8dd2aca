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


# ------------------------------------------------------ HLL distinct sketch
# Engine-portable HyperLogLog: the classic mergeable distinct-count
# sketch (Flajolet et al. 2007; Spark's own approx_count_distinct is the
# HLL++ variant — reimplemented here portably because its registers are
# JVM-internal and could never be oracle-matched). EVERYTHING is integer
# arithmetic: a 31-bit multiplicative mix both engines compute
# identically, trailing-zero rank via the mod-37 de Bruijn trick, the
# register fold as sums of exact powers of two scaled by 2^24, and the
# bias/linear-counting constants embedded as integer literals (ln table
# scaled by 2^20) — so the ESTIMATE, not just the registers, is
# bit-identical across Spark and DuckDB. At 100 TB the shape is the
# point: per-(group, bucket) max is map-side combinable, the final fold
# touches m=512 rows per group, and sketches merge across partitions /
# days by register-max — the standard distinct-count rollup.
HLL_P = 9
HLL_M = 1 << HLL_P                    # 512 registers
HLL_W_BITS = 31 - HLL_P               # 22 payload bits
HLL_ALPHA_MICRO = 719783              # round(1e6 * 0.7213/(1 + 1.079/512))
HLL_LC_THRESHOLD = 5 * HLL_M // 2     # linear-counting regime bound
_HLL_LN_SCALED = [0] + [
    round(__import__("math").log(v) * (1 << 20)) for v in range(1, HLL_M + 1)
]


def _spark_xor(a: str, b: str) -> str:
    return f"({a} ^ {b})"


def _duck_xor(a: str, b: str) -> str:
    return f"xor({a}, {b})"


def _hll_mix_sql(col: str, xor) -> str:
    """SQL for the 31-bit integer mix (LCG + xorshift, applied twice);
    ``xor`` formats the dialect's XOR (Spark ``^``, DuckDB ``xor()``) —
    everything else is dialect-common integer arithmetic."""
    h1 = f"((({col}) * 1103515245 + 12345) % 2147483648)"
    h2 = xor(h1, f"({h1} >> 15)")
    h3 = f"((({h2}) * 1103515245 + 54321) % 2147483648)"
    return xor(h3, f"({h3} >> 13)")


def _hll_tz_case(lsb: str) -> str:
    """Trailing-zero count of a power of two via the mod-37 perfect
    hash (2^k % 37 is distinct for k < 36) — branch table shared by
    both dialects."""
    whens = " ".join(
        f"WHEN {pow(2, k, 37)} THEN {k}" for k in range(HLL_W_BITS)
    )
    return f"(CASE (({lsb}) % 37) {whens} ELSE 0 END)"


def _hll_rho_sql(w: str) -> str:
    lsb = f"(({w}) - (({w}) & (({w}) - 1)))"
    return f"(CASE WHEN ({w}) = 0 THEN {HLL_W_BITS + 1} ELSE {_hll_tz_case(lsb)} + 1 END)"


def hll_register_cols():
    """(bucket, rho) Column pair over ``user_id`` — the per-row sketch
    observables shared by the batch and streaming HLL operators."""
    mix = _hll_mix_sql("user_id", _spark_xor)
    bucket = F.expr(mix) % HLL_M
    rho = F.expr(_hll_rho_sql(f"(({mix}) div {HLL_M})"))
    return bucket, rho


def hll_fold(regs: DataFrame, keys: list[str]) -> DataFrame:
    """Fold (keys..., bucket, m_rho) register rows into per-key HLL
    estimates — the shared integer-exact estimator (see module
    constants). Registers are MERGEABLE by max, so this same fold
    finalizes batch registers, streaming state emissions, or unions of
    per-day register tables."""
    # one JVM-side parse for the 513-entry literal table: the former
    # per-element F.lit chain cost ~5 py4j round trips per entry of
    # pure driver-side plan-build time (the kmeans literal pathology)
    ln_arr = F.expr(
        "array(%s)" % ", ".join(str(int(v)) for v in _HLL_LN_SCALED)
    )
    folded = (
        regs.groupBy(*keys)
        .agg(
            F.count("*").alias("n_present"),
            F.sum(F.expr("shiftleft(1L, CAST(24 - m_rho AS INT))")).alias(
                "s_present"
            ),
        )
        .withColumn("v_empty", F.lit(HLL_M) - F.col("n_present"))
        .withColumn(
            "s_scaled",
            F.col("s_present") + F.col("v_empty") * F.lit(1 << 24),
        )
    )
    # the raw-estimate numerator exceeds 2^53, so the division MUST be
    # integer `div` (a double floor would diverge from DuckDB's //)
    e_raw = F.expr(
        f"CAST(({HLL_ALPHA_MICRO}L * {HLL_M} * {HLL_M} * {1 << 24}L) "
        f"div (s_scaled * 1000000L) AS BIGINT)"
    )
    e_lc = F.floor(
        F.lit(HLL_M)
        * (
            F.lit(_HLL_LN_SCALED[HLL_M])
            - F.element_at(ln_arr, (F.col("v_empty") + 1).cast("int"))
        )
        / F.lit(1 << 20)
    ).cast("long")
    est = F.when(
        (F.col("v_empty") > 0) & (e_raw <= HLL_LC_THRESHOLD), e_lc
    ).otherwise(e_raw)
    return folded.select(*keys, est.alias("est_distinct"))


def distinct_users_hll(events: DataFrame) -> DataFrame:
    """(event_type, est_distinct, exact_distinct): HLL distinct user
    estimate per event type next to the exact count (the exact count is
    part of the contract so the sketch's error is auditable in the
    oracle diff, and it exercises the expensive path HLL replaces).

    Two shuffles: (event_type, bucket) register max — partial-aggregated
    map-side, state bounded at m rows per group — then the per-group
    integer fold. The estimator is plain HLL with the standard
    small-range linear-counting correction, all in scaled-integer
    arithmetic (see module constants) so DuckDB reproduces it exactly."""
    bucket, rho = hll_register_cols()
    regs = (
        events.select("event_type", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m_rho"))
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        hll_fold(regs, ["event_type"])
        .join(exact, "event_type")
        .select("event_type", "est_distinct", "exact_distinct")
    )


def duckdb_distinct_hll_sql() -> str:
    h = _hll_mix_sql("user_id", _duck_xor)
    rho = _hll_rho_sql(f"({h} // {HLL_M})")
    ln_list = "[" + ", ".join(str(v) for v in _HLL_LN_SCALED[1:]) + "]"
    return f"""
    WITH hashed AS (
      SELECT event_type, ({h}) % {HLL_M} AS bucket, {rho} AS rho
      FROM events
    ),
    regs AS (
      SELECT event_type, bucket, max(rho) AS m_rho
      FROM hashed GROUP BY 1, 2
    ),
    folded AS (
      SELECT event_type,
             count(*) AS n_present,
             CAST(sum(CAST(1 AS BIGINT) << (24 - m_rho)) AS BIGINT) AS s_present
      FROM regs GROUP BY 1
    ),
    est AS (
      SELECT event_type,
             ({HLL_M} - n_present) AS v_empty,
             s_present + ({HLL_M} - n_present) * (CAST(1 AS BIGINT) << 24)
               AS s_scaled
      FROM folded
    ),
    raw AS (
      SELECT event_type, v_empty,
             CAST(({HLL_ALPHA_MICRO}::BIGINT * {HLL_M} * {HLL_M}
                   * (CAST(1 AS BIGINT) << 24)) // (s_scaled * 1000000)
                  AS BIGINT) AS e_raw
      FROM est
    ),
    final AS (
      SELECT event_type,
             CASE WHEN v_empty > 0 AND e_raw <= {HLL_LC_THRESHOLD}
                  THEN CAST(({HLL_M}::BIGINT
                        * ({_HLL_LN_SCALED[HLL_M]} -
                           list_extract({ln_list}, CAST(v_empty AS INT))))
                        // {1 << 20} AS BIGINT)
                  ELSE e_raw END AS est_distinct
      FROM raw
    )
    SELECT f.event_type, f.est_distinct, e.exact_distinct
    FROM final f
    JOIN (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
          FROM events GROUP BY 1) e USING (event_type)
    """


def duckdb_streaming_hll_sql(
    minutes: int = WINDOW_MIN, watermark_s: int = 600
) -> str:
    """Oracle for the STREAMING windowed HLL: per (closed window,
    event_type), the same integer-exact estimator over registers built
    from the same portable hash — restricted to windows whose end has
    fallen behind the final watermark (append-mode emission rule)."""
    secs = minutes * 60
    h = _hll_mix_sql("user_id", _duck_xor)
    rho = _hll_rho_sql(f"({h} // {HLL_M})")
    ln_list = "[" + ", ".join(str(v) for v in _HLL_LN_SCALED[1:]) + "]"
    return f"""
    WITH hashed AS (
      SELECT (CAST(floor(epoch(ts)) AS BIGINT) // {secs}) * {secs}
               AS window_start_s,
             event_type, ({h}) % {HLL_M} AS bucket, {rho} AS rho
      FROM events
    ),
    regs AS (
      SELECT window_start_s, event_type, bucket, max(rho) AS m_rho
      FROM hashed GROUP BY 1, 2, 3
    ),
    folded AS (
      SELECT window_start_s, event_type,
             count(*) AS n_present,
             CAST(sum(CAST(1 AS BIGINT) << (24 - m_rho)) AS BIGINT) AS s_present
      FROM regs GROUP BY 1, 2
    ),
    est AS (
      SELECT window_start_s, event_type,
             ({HLL_M} - n_present) AS v_empty,
             s_present + ({HLL_M} - n_present) * (CAST(1 AS BIGINT) << 24)
               AS s_scaled
      FROM folded
    ),
    raw AS (
      SELECT window_start_s, event_type, v_empty,
             CAST(({HLL_ALPHA_MICRO}::BIGINT * {HLL_M} * {HLL_M}
                   * (CAST(1 AS BIGINT) << 24)) // (s_scaled * 1000000)
                  AS BIGINT) AS e_raw
      FROM est
    ),
    final AS (
      SELECT window_start_s, event_type,
             CASE WHEN v_empty > 0 AND e_raw <= {HLL_LC_THRESHOLD}
                  THEN CAST(({HLL_M}::BIGINT
                        * ({_HLL_LN_SCALED[HLL_M]} -
                           list_extract({ln_list}, CAST(v_empty AS INT))))
                        // {1 << 20} AS BIGINT)
                  ELSE e_raw END AS est_distinct
      FROM raw
    ),
    m AS (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS mt FROM events)
    SELECT f.window_start_s, f.event_type, f.est_distinct
    FROM final f, m
    WHERE f.window_start_s + {secs} <= m.mt - {watermark_s}
    """
