"""financial_data_lakehouse_pipeline__spark — a PySpark-native analytics engine.

A clean-room, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``thang08082003/Financial-Data-Lakehouse-
Pipeline-`` (surveyed in /root/repo/SURVEY.md), extended with the operators a
large-scale (100 TB) training-data pipeline needs: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard), embedding similarity search, text
analysis, and time-window/sessionization/as-of operators.

Design rules (see SURVEY.md §7):
  * DataFrame/SQL first — declare logical plans, let Catalyst+AQE pick the
    physical strategy. No RDDs, no driver-side collects inside operators.
  * Every operator is a parameterized function over DataFrames (no
    hard-coded paths, unlike the reference's scripts).
  * ANSI-mode safe: all divisions are guarded, all casts explicit.
  * Exact-decimal aggregation helpers keep sums deterministic across
    engines and partitionings (needed both for the DuckDB oracle and for
    reproducible results under AQE re-partitioning at scale).
"""

from financial_data_lakehouse_pipeline__spark.session import build_session, tune_runtime

__all__ = ["build_session", "tune_runtime"]

__version__ = "0.1.0"
