"""Time-series operators over event streams: trailing EWMA and
z-score anomaly flagging.

A true EWMA is a recursive fold over the whole history — not a window
aggregate.  The scale-honest form here is the TRUNCATED EWMA over the
trailing ``span`` rows: weights below (1-alpha)^span are dropped (for
alpha=0.3, span=20 the dropped tail carries < 0.1% of the mass), and
the state per row is a bounded collect_list over a ROWS window — no
unbounded state, no Python, and the exact same expression runs on the
DuckDB oracle (list() window aggregate + list_transform/pow).

Weighting: the frame's collect_list is ordered oldest -> newest, so
element p (1-based) of an L-element list gets weight (1-alpha)^(L-p);
the result is normalized by the weight sum (the "adjust=True" form of
pandas ewm, which is also what a fresh stream restart computes — no
dependence on pre-window history).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def trailing_ewma(value_list: Column, alpha: float) -> Column:
    """Normalized EWMA of an array ordered oldest->newest."""
    size = F.size(value_list)
    decay = F.lit(1.0 - alpha)
    weighted = F.transform(
        value_list, lambda x, i: x * F.pow(decay, (size - 1 - i).cast("double"))
    )
    weights = F.transform(
        value_list, lambda x, i: F.pow(decay, (size - 1 - i).cast("double"))
    )
    tot = F.aggregate(weighted, F.lit(0.0), lambda a, x: a + x)
    wsum = F.aggregate(weights, F.lit(0.0), lambda a, x: a + x)
    return tot / wsum


def ewma_zscore(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    span: int = 20,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-key trailing EWMA + anomaly z-score.

    One shuffle (the per-key window sort); every expression is codegen
    array arithmetic.  The z-score compares each value against the
    EWMA and plain stddev of the PRECEDING ``span`` rows (excluding the
    current row, so a spike can't mask itself); rows with fewer than 3
    trailing observations are unflagged (insufficient history).
    """
    order = [ts_col, "event_id"] if "event_id" in events.columns else [ts_col]
    trail = (
        W.partitionBy(key_col).orderBy(*order).rowsBetween(-span, -1)
    )
    vals = F.collect_list(value_col).over(trail)
    n = F.size(vals)
    ewma = trailing_ewma(vals, alpha)
    mean = F.aggregate(vals, F.lit(0.0), lambda a, x: a + x) / n
    var = F.aggregate(vals, F.lit(0.0), lambda a, x: a + (x - mean) * (x - mean)) / (n - 1)
    std = F.sqrt(var)
    z = (F.col(value_col) - ewma) / std
    return events.select(
        key_col,
        ts_col,
        value_col,
        n.cast("long").alias("n_trailing"),
        F.when(n >= 3, F.round(ewma + F.lit(1e-9), 4)).alias("ewma"),
        F.when((n >= 3) & (std > 0), F.round(z + F.lit(1e-9), 4)).alias("zscore"),
        F.when((n >= 3) & (std > 0), F.abs(z) > F.lit(z_threshold))
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )


def session_sequences(
    events: DataFrame,
    gap_ms: int = 1_800_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Behavioral-sequence dataset construction: sessionize each user's
    event stream (gap > ``gap_ms`` starts a new session — the same
    lag+cumsum idiom as p07) and materialize one TRAINING EXAMPLE per
    session: the ordered event-type sequence, its length, duration,
    and value total.  This is the batch form of turning a clickstream
    into sequence-model training data.

    Scale shape: one per-user window pass for the boundaries, one
    grouped aggregate per session; the sequence is assembled with an
    ordered in-group sort (array_sort over (ts, id) structs), bounded
    by session length — no global sort, no self-join."""
    w = W.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap = F.unix_millis(F.col(ts_col)) - F.unix_millis(F.lag(ts_col).over(w))
    flagged = events.select(
        user_col,
        ts_col,
        "event_id",
        "event_type",
        "value",
        F.when(gap > gap_ms, 1)
        .when(F.lag(ts_col).over(w).isNull(), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.select(
        user_col,
        ts_col,
        "event_id",
        "event_type",
        "value",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_id"),
    )
    seq = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(ts_col, "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ),
    )
    return sessions.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        seq.alias("sequence"),
        (F.unix_millis(F.max(ts_col)) - F.unix_millis(F.min(ts_col)))
        .cast("long")
        .alias("duration_ms"),
        F.round(F.sum("value") + F.lit(1e-9), 2).alias("total_value"),
    )


def session_affinity(
    events: DataFrame,
    gap_ms: int = 1_800_000,
    min_sessions: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Within-session event-type affinity (market-basket association
    over sessions): for every unordered pair of event types, the
    number of sessions containing both, its support, and its LIFT
    (support / product of marginals — >1 means the types co-occur
    more than independence predicts).  The recommendation/affinity
    rollup next to x72's sequence construction.

    Scale shape: the same one-window sessionization, then a distinct
    (user, session, type) frame feeding three counts — per-session
    type sets (bounded by the type vocabulary, so the in-set pair
    expansion is tiny), per-type session counts, and the scalar
    session total (broadcast).  No self-join of the event log; the
    pair join touches only type-vocabulary-sized tables."""
    from .dedup import unordered_pairs_expr

    w = W.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap = F.unix_millis(F.col(ts_col)) - F.unix_millis(F.lag(ts_col).over(w))
    flagged = events.select(
        user_col,
        ts_col,
        "event_id",
        "event_type",
        F.when(gap > gap_ms, 1)
        .when(F.lag(ts_col).over(w).isNull(), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    st = (
        flagged.select(
            user_col,
            "event_type",
            F.sum("new_session")
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("session_id"),
        )
        .select(user_col, "session_id", "event_type")
        .distinct()
    )
    sess_types = st.groupBy(user_col, "session_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    n_sessions = sess_types.agg(F.count("*").alias("n"))
    singles = st.groupBy("event_type").agg(F.count("*").alias("n_t"))
    pairs = (
        sess_types.select(
            F.explode(
                unordered_pairs_expr(
                    F.col("types"),
                    inner=lambda x, y: F.struct(
                        x.alias("type_a"), y.alias("type_b")
                    ),
                )
            ).alias("p")
        )
        .select("p.type_a", "p.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_sessions)
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b"))
    return (
        pairs.join(sa, "type_a")
        .join(sb, "type_b")
        .crossJoin(F.broadcast(n_sessions))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(F.col("n_ab") / F.col("n") + F.lit(1e-9), 4).alias("support"),
            F.round(
                F.col("n_ab") * F.col("n") / (F.col("n_a") * F.col("n_b"))
                + F.lit(1e-9),
                4,
            ).alias("lift"),
        )
    )


def leadlag_xcorr(
    events: DataFrame,
    max_lag_hours: int = 3,
    min_hours: int = 10,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Lead-lag cross-correlation between event-type time series:
    hourly counts per type, then Pearson correlation of every type
    pair at every lag in [-max_lag, +max_lag] hours — a positive peak
    at lag L means type_a's activity leads type_b's by L hours (the
    classic marketing/ops question "do views predict purchases an
    hour later?").

    Scale shape: ONE pass over the event log to hours x types counts
    (map-side combinable; the series table is tiny — hours x type
    vocabulary — regardless of event volume); every join/corr after
    that runs on the aggregated series only."""
    hourly = (
        events.groupBy(
            F.date_trunc("hour", ts_col).alias("h"), F.col(type_col).alias("t")
        )
        .agg(F.count("*").alias("cnt"))
    )
    lags = F.explode(
        F.sequence(F.lit(-max_lag_hours), F.lit(max_lag_hours))
    ).alias("lag_hours")
    a = hourly.select(
        F.col("t").alias("type_a"), F.col("h").alias("ha"), F.col("cnt").alias("ca")
    ).crossJoin(events.sparkSession.range(1).select(lags))
    b = hourly.select(
        F.col("t").alias("type_b"), F.col("h").alias("hb"), F.col("cnt").alias("cb")
    )
    joined = a.join(
        b,
        (F.col("hb") == F.col("ha") + F.make_interval(hours=F.col("lag_hours")))
        & (F.col("type_a") < F.col("type_b")),
    )
    return (
        joined.groupBy("type_a", "type_b", "lag_hours")
        .agg(F.count("*").alias("n_hours"), F.corr("ca", "cb").alias("xc"))
        .filter((F.col("n_hours") >= min_hours) & F.col("xc").isNotNull())
        .select(
            "type_a",
            "type_b",
            "lag_hours",
            "n_hours",
            F.round(F.col("xc") + F.lit(1e-9), 4).alias("xcorr"),
        )
    )


def seasonal_anomalies(
    events: DataFrame,
    z_threshold: float = 2.0,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Seasonality-aware anomaly detection: build the hour-of-day
    baseline (mean/stddev of hourly counts per (type, hour-of-day))
    and flag concrete hours whose count deviates more than
    ``z_threshold`` sigmas from THEIR OWN seasonal slot — the
    complement of the sequential EWMA detector (x38): a 2am spike is
    judged against 2am behavior, not the global or trailing mean.

    One event-log pass to the hours x types count table; the baseline
    is a 24 x |types| aggregate joined back to the tiny series —
    nothing after the first aggregate touches the log."""
    hourly = (
        events.groupBy(
            F.date_trunc("hour", ts_col).alias("h"), F.col(type_col).alias("t")
        )
        .agg(F.count("*").alias("cnt"))
    )
    baseline = hourly.groupBy(
        F.col("t"), F.hour("h").alias("hod")
    ).agg(
        F.avg("cnt").alias("mu"),
        F.stddev_samp("cnt").alias("sigma"),
        F.count("*").alias("n_obs"),
    )
    z = (F.col("cnt") - F.col("mu")) / F.col("sigma")
    return (
        hourly.withColumn("hod", F.hour("h"))
        .join(baseline, ["t", "hod"])
        .filter(
            (F.col("sigma") > 0)
            & (F.abs(z) > z_threshold)
            & (F.col("n_obs") >= 3)
        )
        .select(
            F.col("t").alias("event_type"),
            F.col("h").alias("hour"),
            "cnt",
            F.round(F.col("mu") + F.lit(1e-9), 4).alias("seasonal_mean"),
            F.round(z + F.lit(1e-9), 4).alias("z_score"),
        )
    )
