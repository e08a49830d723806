"""Analysis composites (reference scripts/spark_jobs/sentiment_analysis.py).

Thin compositions of the §2.2-§2.6 operators: value bucketing, threshold
event detection with classification, signal-alignment scoring, and summary
statistics — generalized to any (entity, time, signal, outcome) columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from financial_data_lakehouse_pipeline__spark.functions import dmean


def bucketize(
    df: DataFrame,
    col: str,
    edges: Sequence[float],
    labels: Sequence[str],
    out: str = "bucket",
) -> DataFrame:
    """Map a numeric column into labeled buckets via a when-chain
    (reference sa:153-160: five sentiment buckets). len(labels) must be
    len(edges)+1; intervals are (-inf, e0], (e0, e1], ..., (en, inf)."""
    if len(labels) != len(edges) + 1:
        raise ValueError("need len(labels) == len(edges) + 1")
    c = F.col(col)
    expr = None
    for e, lab in zip(edges, labels[:-1]):
        expr = F.when(c <= e, lab) if expr is None else expr.when(c <= e, lab)
    expr = expr.otherwise(labels[-1]) if expr is not None else F.lit(labels[-1])
    return df.withColumn(out, expr)


def detect_events(
    df: DataFrame,
    signal_col: str,
    magnitude_threshold: float,
    support_col: str,
    min_support: int,
    classify: dict[str, Column] | None = None,
) -> DataFrame:
    """Threshold event detection (reference sa:215-218: |avg_sentiment| >=
    threshold AND news_count >= min_news), with optional classification
    columns (reference sa:265-270)."""
    out = df.filter(
        (F.abs(F.col(signal_col)) >= magnitude_threshold)
        & (F.col(support_col) >= min_support)
    )
    if classify:
        out = out.withColumns(dict(classify))
    return out


def alignment_score(signal: Column, outcome: Column) -> Column:
    """+1 when signal and outcome agree in sign, -1 when opposed, 0 when
    either is flat (reference sa:273-279: signum(sentiment)*signum(return))."""
    return F.signum(signal) * F.signum(outcome)


def summary_stats(
    df: DataFrame, keys: Sequence[str], value_cols: Sequence[str]
) -> DataFrame:
    """Per-group mean/min/max/stddev for each value column (reference
    sa:313-348 summary job)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in value_cols:
        col = F.col(c)
        aggs += [
            dmean(col).alias(f"{c}_avg"),
            F.min(col).alias(f"{c}_min"),
            F.max(col).alias(f"{c}_max"),
            F.stddev_samp(col).alias(f"{c}_stddev"),
        ]
    return df.groupBy(*keys).agg(*aggs)
