"""Event-time windowing operators (batch form; streaming twins in
``streaming/ingest.py``).

The reference's event-handling is all outside Spark (S3→Lambda triggers);
the engine brings it inside: tumbling windows via ``F.window`` and
gap-based sessionization via lag + running sum — both shuffle exactly once
on (key) and scale with the window/session key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    group_cols: list[str] | None = None,
    aggs: dict | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregate.

    ``F.window`` is the streaming-compatible primitive (same code runs under
    Structured Streaming with a watermark).  Output exposes ``window_start``
    so results are plain-SQL-comparable (window.start of a '1 hour' tumble
    == date_trunc('hour', ts)).
    """
    group_cols = group_cols or []
    # default double-sum goes through decimal so partial-agg order can't
    # perturb the result (engine-portable exact arithmetic)
    aggs = aggs or {
        "n_events": F.count("*"),
        "sum_value": F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2).cast("double"),
    }
    agg_exprs = [v.alias(k) for k, v in aggs.items()]
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), *group_cols)
        .agg(*agg_exprs)
        .select(F.col("w.start").alias("window_start"), *group_cols, *aggs.keys())
    )


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the inter-event
    gap exceeds ``gap_minutes``.

    ``tiebreak_col`` (e.g. a unique event id) makes the within-key ordering
    total when ``ts_col`` carries duplicates; without it, tied rows that
    straddle a session boundary can be assigned to different sessions by
    different engines (lag/running-sum order is otherwise unspecified).

    Boundary semantics: STRICTLY greater (> gap) on floored-second deltas —
    an event exactly ``gap_minutes`` after its predecessor stays in the
    SAME session.  The built-in ``F.session_window`` agrees on the exact-gap
    case (it MERGES touching sessions — pinned empirically by
    test_session_window_exact_gap_merges), but evaluates the gap at full
    microsecond precision where this composed form floors to seconds; the
    two can differ only for sub-second gap excesses.

    lag + conditional running count over a (key ORDER BY ts) window — one
    shuffle on the key.  Skewed keys (one user = millions of events) are the
    scale risk; AQE skew handling or key-salting applies.
    Returns per-session rows: (key, session_id, session_start, session_end,
    n_events, sum_value).
    """
    order_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    gap_s = gap_minutes * 60
    # gap = difference of floor-to-second epoch values (SQL EXTRACT(EPOCH)
    # boundary semantics), computed against an NTZ epoch so it is exact
    # under any session timezone — unix_timestamp would re-interpret the
    # wall clock and skew gaps that span a DST transition
    with_flag = (
        df.withColumn(
            "__es",
            F.expr(
                "timestampdiff(SECOND,"
                f" TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
            ),
        )
        .withColumn(
            "__new_session",
            F.when(
                (F.col("__es") - F.lag("__es").over(w)) > gap_s, 1
            )
            .otherwise(0)
            .cast("long"),
        )
        .drop("__es")
    )
    with_id = with_flag.withColumn(
        "session_id",
        F.sum("__new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_id.groupBy(key_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )
