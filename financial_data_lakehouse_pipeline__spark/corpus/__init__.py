"""Query corpus: every implemented operator as a named query over the
driver testdata, paired (where SQL-expressible) with an ANSI-SQL oracle
DuckDB runs on the same parquet — the driver's correctness gate
(/root/repo/__spark_entry__.py contract).

Cross-engine determinism rules applied throughout (SURVEY.md §7.3):
  * sums/averages via exact decimal accumulation (functions.dsum/dmean) —
    order-independent, so partial-aggregation order can't skew results;
  * inherently-floating aggregates (stddev, corr, cosine) rounded;
  * every window ordered by a TOTAL order (unique tiebreaker columns);
  * collect_set always array_sort'ed;
  * timestamps compared at microsecond precision (events.ts ns → µs on
    both engines);
  * every computed column aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame query; ``oracle`` is
    the equivalent DuckDB SQL (None → driver runs a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            # later registration would silently shadow the earlier one
            # (cost a lost query in round 4) — fail at import instead
            raise ValueError(f"duplicate corpus query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


# ---- shared SQL fragments (mirror functions.dsum / dmean exactly) ----

def sql_dsum(expr: str) -> str:
    """Exact decimal sum cast to double — mirrors functions.dsum.

    The double cast goes THROUGH VARCHAR: DuckDB's direct
    DECIMAL(38,6)→DOUBLE cast double-rounds (int128→double, then the
    10^-6 scale — measured 24% off-by-one-ulp for sums in the 1e10
    band, where ulp > 1e-6), while Spark's BigDecimal.doubleValue is
    correctly rounded — the sf1 full-corpus run caught the two engines
    disagreeing by exactly 1 ulp on 5e10-scale revenue sums. DuckDB's
    VARCHAR→DOUBLE parse is correctly rounded (0/20000 mismatches vs
    Python's exact conversion), so the string hop restores bit-equality
    at any magnitude; it costs one tiny conversion per output row."""
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE)"


def sql_dmean(expr: str, count_expr: str | None = None) -> str:
    """dsum/count double division — mirrors functions.dmean."""
    cnt = count_expr or f"COUNT({expr})"
    return f"({sql_dsum(expr)} / NULLIF({cnt}, 0))"


def sql_money_sum(expr: str, decimals: int = 2) -> str:
    """Scaled-integer exact sum — mirrors functions.money_sum.

    Scale literals use scientific notation (``100e0``): a ``100.0``
    literal parses as DECIMAL in both Spark SQL and DuckDB, silently
    turning the division into decimal arithmetic; ``e0`` literals are
    DOUBLE in both engines, matching the DataFrame side's F.lit(100.0).
    """
    s = 10 ** decimals
    return f"(SUM(CAST(FLOOR({expr} * {s}e0 + 5e-1) AS BIGINT)) / {s}e0)"


def queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLE)


_LOADED = False


def _load() -> None:
    """Import all corpus submodules (each registers its queries)."""
    global _LOADED
    if _LOADED:
        return
    from financial_data_lakehouse_pipeline__spark.corpus import (  # noqa: F401
        acid_q,
        curation,
        events_q,
        lake,
        mlfeat_q,
        mlprep,
        relational,
        sketches_q,
        textdocs,
        tpch_q,
        vectors,
        windows_q,
    )

    _LOADED = True
