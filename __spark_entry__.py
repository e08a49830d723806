"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the engine's query corpus
(financial_data_lakehouse_pipeline__spark.corpus): every implemented
operator from SURVEY.md §2 is a named (spark, sf_dir) -> DataFrame query,
paired — wherever ANSI-SQL-expressible — with an equivalent DuckDB oracle
statement over the same parquet tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable when the driver runs this file from
# anywhere (the package lives next to this file).
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from financial_data_lakehouse_pipeline__spark import corpus  # noqa: E402
from financial_data_lakehouse_pipeline__spark.session import tune_runtime  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the daily-market-summary
    rollup (v_daily_summary — SURVEY.md §7.2 step 1). Driver checks rows>0."""
    tune_runtime(spark)
    q = corpus.queries()["v_daily_summary"]
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    LLM-data extensions). Each callable takes (spark, sf_dir)."""
    return corpus.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query. Only the two
    engine-specific sketches (HLL distinct, approx-percentile) are
    intentionally absent — the driver records rows-only checks for those;
    everything else (including streaming driven-to-completion and the
    recursive EMA/MACD/CUSUM family via recursive CTEs) is oracle-paired."""
    return corpus.oracle_sql()
