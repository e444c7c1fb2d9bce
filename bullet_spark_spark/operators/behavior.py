"""Behavioral / product-analytics operators over event streams at rest:
batch sessionization, ordered funnel conversion, retention cohorts —
the analytics a stored event table answers that the reference's
forward-only streams cannot (bullet sees each record once;
JoinStreaming.scala merges partials and moves on). All pure
DataFrame/window algebra, engine-portable, oracle-checkable.

Scale shapes:
- sessionize: ONE shuffle on the session key; the gap detection and the
  running session index are two window functions over the same
  (key, ts) partitioning — no self-joins, no state.
- funnel: one conditional aggregation per step over the same per-key
  partitioning (step k's first-hit time is a conditional min bounded by
  step k-1's) — a single aggregation job computing all steps at once is
  impossible because each step's predicate references the previous
  step's result, but the per-step aggs all reuse one exchange.
- retention: two aggregations (per-user cohort, then cohort × offset
  counts) — both map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign batch session ids: a new session starts when the gap to the
    key's previous event exceeds ``gap_minutes`` (the batch counterpart
    of Spark's streaming session_window, answering retrospective
    questions over stored history). Adds ``session_idx`` (0-based per
    key) and ``session_id`` ("key#idx"). Deterministic given a total
    event order — pass ``tiebreak_col`` when timestamps can tie."""
    order = [F.col(ts_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = W.partitionBy(key_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    # TIMESTAMP_NTZ (the fixtures' parquet flavor) cannot cast straight to
    # double — bridge through TIMESTAMP (the watermark-site convention)
    gap_s = F.col(ts_col).cast("timestamp").cast("double") - prev_ts.cast(
        "timestamp"
    ).cast("double")
    new_session = F.when(
        prev_ts.isNull() | (gap_s > gap_minutes * 60.0), 1
    ).otherwise(0)
    idx = (
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0)) - 1
    ).cast("long")
    return df.withColumn("session_idx", idx).withColumn(
        "session_id",
        F.concat_ws("#", F.col(key_col).cast("string"), F.col("session_idx")),
    )


def funnel_conversion(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    event_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: for each key, step k counts only if it occurs
    STRICTLY AFTER the key's first qualifying step k-1 (first-touch
    attribution, the standard product-funnel semantics). Returns one row
    per step: (step_idx, step, n_converted) with n_converted
    monotonically non-increasing down the funnel.

    One aggregation per step over the same key partitioning: step k's
    first-hit time is min(ts | event = step_k ∧ ts > t_{k-1}) — the
    sequential dependency is inherent to funnel semantics, but every agg
    reuses the one exchange and the per-key frame shrinks as keys drop
    out."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = df.filter(F.col(event_col) == steps[0]).groupBy(key_col).agg(
        F.min(ts_col).alias("t0")
    )
    counts = [cur.count()]
    for k, step in enumerate(steps[1:], start=1):
        nxt = (
            df.filter(F.col(event_col) == step)
            .join(cur.select(key_col, f"t{k-1}"), key_col)
            .filter(F.col(ts_col) > F.col(f"t{k-1}"))
            .groupBy(key_col)
            .agg(F.min(ts_col).alias(f"t{k}"))
        )
        counts.append(nxt.count())
        cur = nxt
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, s, int(c)) for i, (s, c) in enumerate(zip(steps, counts))],
        "step_idx int, step string, n_converted long",
    )


def retention_cohorts(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "week",
) -> DataFrame:
    """Cohort retention triangle: users grouped by their FIRST active
    period; for each (cohort, periods-since-cohort offset) the count of
    cohort members active in that period. Two map-side-combinable
    aggregations: per-(user, period) presence → per-user cohort join →
    (cohort, offset) counts. Offsets in periods via integer timestamp
    arithmetic (engine-portable, no date-diff dialect drift)."""
    period = F.date_trunc(granularity, F.col(ts_col)).cast("timestamp")
    active = df.select(
        F.col(key_col), period.alias("period")
    ).distinct()
    cohort = active.groupBy(key_col).agg(F.min("period").alias("cohort"))
    seconds = {"day": 86400, "week": 7 * 86400}[granularity]
    joined = active.join(cohort, key_col)
    return (
        joined.groupBy(
            "cohort",
            (
                (
                    F.col("period").cast("long") - F.col("cohort").cast("long")
                )
                / seconds
            )
            .cast("long")
            .alias("offset"),
        )
        .agg(F.countDistinct(key_col).alias("n_active"))
    )


def event_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    event_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event sequences →
    (from_event, to_event, n, prob): how users move between states, the
    next-step model behind funnel design and anomaly watch ("purchase →
    refund spiked"). prob = n / Σ n over the same from_event, rounded 6 dp
    (exact count ratios — engine-portable).

    ``tiebreak_col`` makes (key, ts, tiebreak) a total order when one key
    emits simultaneous events (same requirement as events_to_scd2).

    Shape at 100 TB: ONE shuffle keyed by user (the lag window), then a
    transition-count aggregate whose state is |event types|² — tiny; the
    per-from normalization is a window over that tiny frame."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = W.partitionBy(key_col).orderBy(*order)
    pairs = (
        df.withColumn("__prev", F.lag(F.col(event_col)).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(
            F.col("__prev").alias("from_event"),
            F.col(event_col).alias("to_event"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = F.sum("n").over(W.partitionBy("from_event"))
    return pairs.withColumn(
        "prob", F.round(F.col("n").cast("double") / total, 6)
    )


def top_paths(
    df: DataFrame,
    key_col: str = "user_id",
    event_col: str = "event_type",
    ts_col: str = "ts",
    path_len: int = 5,
    k: int = 10,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Top-k initial user journeys → (path, n_users): each key's first
    ``path_len`` events (in time order) joined with '>', counted across
    keys — the entry-path report (which onboarding sequences dominate).
    Ties in the ranking break by path string; ties in event order break
    by ``tiebreak_col`` (required for a deterministic path when
    timestamps collide).

    Shape: one user-keyed window (rank events, keep first path_len), one
    per-user reassembly via array_sort of (idx, event) structs — the
    chunk_by_sentences discipline, deterministic under any partitioning —
    then a path-keyed count and TakeOrderedAndProject."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = W.partitionBy(key_col).orderBy(*order)
    firsts = (
        df.withColumn("__i", F.row_number().over(w))
        .filter(F.col("__i") <= path_len)
    )
    paths = firsts.groupBy(key_col).agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__i"), F.col(event_col)))
                ),
                lambda x: x[event_col],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(k)
    )


def ab_test_report(
    df: DataFrame,
    variant_col: str,
    success: Column,
    control: str,
    treatment: str,
) -> DataFrame:
    """Two-proportion z-test between a control and a treatment variant →
    one row: (n_control, n_treatment, rate_control, rate_treatment,
    lift, z_score) — the experimentation readout over stored events the
    reference's forward-only streams cannot answer retroactively.

    z = (p_t − p_c) / sqrt(p̂(1−p̂)(1/n_c + 1/n_t)) with p̂ the pooled
    rate. Counts are exact; every ratio is a single double expression
    (identical in any engine); rates/lift/z rounded 6 dp. Degenerate
    inputs (an empty variant, pooled rate 0 or 1) yield NULL z rather
    than a division error.

    ONE aggregation pass over one scan — four conditional counts."""
    is_c = F.col(variant_col) == control
    is_t = F.col(variant_col) == treatment
    s = F.coalesce(success.cast("int"), F.lit(0))
    row = df.agg(
        F.sum(F.when(is_c, 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(is_t, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(is_c, s).otherwise(0)).alias("s_c"),
        F.sum(F.when(is_t, s).otherwise(0)).alias("s_t"),
    )
    p_c = F.col("s_c") / F.col("n_c")
    p_t = F.col("s_t") / F.col("n_t")
    pooled = (F.col("s_c") + F.col("s_t")) / (F.col("n_c") + F.col("n_t"))
    se = F.sqrt(
        pooled * (1 - pooled) * (1.0 / F.col("n_c") + 1.0 / F.col("n_t"))
    )
    z = F.when(
        (F.col("n_c") > 0) & (F.col("n_t") > 0) & (se > 0),
        F.round((p_t - p_c) / se, 6),
    )
    return row.select(
        F.col("n_c").alias("n_control"),
        F.col("n_t").alias("n_treatment"),
        F.when(F.col("n_c") > 0, F.round(p_c, 6)).alias("rate_control"),
        F.when(F.col("n_t") > 0, F.round(p_t, 6)).alias("rate_treatment"),
        F.when(
            (F.col("n_c") > 0) & (F.col("n_t") > 0) & (p_c != 0),
            F.round((p_t - p_c) / p_c, 6),
        ).alias("lift"),
        z.alias("z_score"),
    )


def attribution(
    touches: DataFrame,
    conversions: DataFrame,
    user_col: str,
    channel_col: str,
    touch_ts: str = "touch_ts",
    conv_ts: str = "conv_ts",
    conv_id: str = "conv_id",
    touch_id: str = "touch_id",
    value_col: str | None = None,
    lookback_sec: int = 7 * 24 * 3600,
    round_dp: int = 6,
) -> DataFrame:
    """Multi-touch MARKETING ATTRIBUTION: credit each conversion to the
    touches (clicks/views, tagged with a channel) that preceded it within
    ``lookback_sec``, under the three standard models at once —
    FIRST-touch (the discovery channel), LAST-touch (the closer), and
    LINEAR (1/n credit to each of the n touches in the window). Output is
    one row per channel: first/last conversion counts, linear credit, and
    last-touch-attributed value.

    Shape: one equi-join on the user key with the lookback as a range
    conjunct (per-user touch × conversion pairs — bounded by activity per
    user, never a cross of the event table), then three window functions
    over the SAME (conversion) partitioning, one exchange. Conversions
    with no in-window touch are unattributed and drop out (the standard
    convention; count them upstream if needed). Determinism: ties in
    touch time are broken by touch id; linear credits are per-term
    rounded then summed as exact decimals so the float result is
    engine-reproducible.

    At 100 TB the join shuffles on user — activity skew (a bot user with
    1e6 touches) multiplies pairs; route through the salting/df-cap
    posture upstream if the per-user event cap isn't already enforced at
    ingest (it usually is in product-analytics stores).
    """
    t = touches.select(
        F.col(user_col).alias("__u"),
        F.col(touch_id).alias("__tid"),
        F.col(touch_ts).alias("__tts"),
        F.col(channel_col).alias("channel"),
    )
    c = conversions.select(
        F.col(user_col).alias("__u"),
        F.col(conv_id).alias("__cid"),
        F.col(conv_ts).alias("__cts"),
        *(
            [F.col(value_col).alias("__val")]
            if value_col is not None
            else [F.lit(0.0).alias("__val")]
        ),
    )
    j = c.join(t, "__u").filter(
        (F.col("__tts") <= F.col("__cts"))
        & (
            F.col("__tts")
            >= F.col("__cts") - F.expr(f"INTERVAL {int(lookback_sec)} SECONDS")
        )
    )
    wf = W.partitionBy("__cid").orderBy(F.col("__tts").asc(), F.col("__tid").asc())
    wl = W.partitionBy("__cid").orderBy(F.col("__tts").desc(), F.col("__tid").desc())
    wn = W.partitionBy("__cid")
    ranked = j.select(
        "channel",
        "__val",
        F.row_number().over(wf).alias("__rf"),
        F.row_number().over(wl).alias("__rl"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    return (
        ranked.groupBy("channel")
        .agg(
            F.sum(F.when(F.col("__rf") == 1, 1).otherwise(0)).alias(
                "first_touch_convs"
            ),
            F.sum(F.when(F.col("__rl") == 1, 1).otherwise(0)).alias(
                "last_touch_convs"
            ),
            F.sum(
                F.round(1.0 / F.col("__n"), 9).cast("decimal(18,9)")
            )
            .cast("double")
            .alias("__lin"),
            F.sum(
                F.when(F.col("__rl") == 1, F.col("__val"))
                .otherwise(0.0)
                .cast("decimal(18,4)")
            )
            .cast("double")
            .alias("last_touch_value"),
        )
        .select(
            "channel",
            "first_touch_convs",
            "last_touch_convs",
            F.round(F.col("__lin"), round_dp).alias("linear_credit"),
            F.round(F.col("last_touch_value"), round_dp).alias(
                "last_touch_value"
            ),
        )
    )
