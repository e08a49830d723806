"""Event-time operators: tumbling/sliding windows, sessionization,
recency weighting (SURVEY.md §2.9 extension — the reference is batch-only;
its closest analogue is the exp(-hours/24) recency weighting at
data_transformation.py:285-293).

These are the BATCH equivalents; streaming variants (watermarks,
session_window) live in financial_data_lakehouse_pipeline__spark.streaming.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from financial_data_lakehouse_pipeline__spark.functions import dsum, guarded_div


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Fixed (tumbling) time-window aggregation.

    Uses F.window — one hash aggregation, no extra shuffle beyond the
    groupBy. Output carries window_start/window_end timestamps.
    """
    g = df.groupBy(F.window(F.col(ts_col), duration).alias("__w"), *keys)
    return g.agg(*[e.alias(o) for o, e in aggs.items()]).select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Sliding (hopping) window aggregation — each row contributes to
    duration/slide windows (F.window replicates rows accordingly)."""
    g = df.groupBy(F.window(F.col(ts_col), duration, slide).alias("__w"), *keys)
    return g.agg(*[e.alias(o) for o, e in aggs.items()]).select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign a session id per key: a new session starts when the gap from
    the previous event exceeds ``gap_seconds``.

    Classic lag + cumulative-sum formulation (also how session_window is
    defined): one shuffle on keys + in-partition sort. Adds columns
    __session (int) — callers aggregate as needed.
    """
    order_cols = [F.col(ts_col), *[F.col(c) for c in order_tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    prev = F.lag(ts_col).over(w)
    # Gap compared in integer microseconds (unix_timestamp would truncate
    # to seconds and shift session boundaries).
    new_session = F.when(
        prev.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev) > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    cum = Window.partitionBy(*keys).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("__new", new_session).withColumn(
        "session_id", F.sum("__new").over(cum).cast("bigint")
    ).drop("__new")


def session_agg(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    aggs: dict[str, Column],
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Sessionize then aggregate per (keys..., session): adds
    session_start/session_end plus caller aggs."""
    s = sessionize(df, keys, ts_col, gap_seconds, order_tiebreak)
    return s.groupBy(*keys, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        *[e.alias(o) for o, e in aggs.items()],
    )


def recency_weighted_mean(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    half_life_hours: float = 24.0,
    out: str = "recency_weighted_avg",
) -> DataFrame:
    """Exponential-recency weighted mean per key, anchored at the GLOBAL
    max timestamp (reference dt:285-304 anchors at current_timestamp; a
    data-anchored origin keeps results reproducible).

    The anchor is computed as a 1-row aggregate and broadcast-joined — no
    driver-side collect, no single-partition window.
    """
    anchor = df.agg(F.max(ts_col).alias("__anchor"))
    hours = (
        F.unix_micros(F.col("__anchor")) - F.unix_micros(F.col(ts_col))
    ) / F.lit(3.6e9)
    weight = F.exp(-hours / F.lit(half_life_hours))
    return (
        df.join(F.broadcast(anchor))
        .withColumn("__w", weight)
        .groupBy(*keys)
        .agg(
            guarded_div(
                dsum(F.col(value_col) * F.col("__w")), dsum(F.col("__w"))
            ).alias(out)
        )
    )
