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
_ORACLE_CEILINGS: dict[str, dict] = {}


def register(
    name: str,
    oracle: str | None = None,
    max_oracle_sf: float | None = None,
    capped_twins: tuple[str, ...] = (),
):
    """Decorator: add a (spark, sf_dir) -> DataFrame query; ``oracle`` is
    the equivalent DuckDB SQL (None → driver runs a rows-only check).

    ``max_oracle_sf`` declares a scale ceiling for the ORACLE, not the
    engine query: a deliberately-quadratic ground-truth twin (e.g. the
    unpruned all-pairs Jaccard join) is the right losslessness proof at
    driver scales and the wrong tool above them (SCALE.md §19c — it
    OOM'd a 74 GB DuckDB at sf1 while the engine side finished in
    433 s). tools/check_oracle.py honors the ceiling: above it the
    query is skipped WITH THE PRINTED REASON, and the ``capped_twins``
    (scale-checkable queries proving the same semantics through capped/
    banded paths) are auto-added to targeted runs so the regime stays
    verified. Encoding the ceiling here replaces the round-11 manual
    campaign exclusion."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            # later registration would silently shadow the earlier one
            # (cost a lost query in round 4) — fail at import instead
            raise ValueError(f"duplicate corpus query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        if max_oracle_sf is not None or capped_twins:
            _ORACLE_CEILINGS[name] = {
                "max_oracle_sf": max_oracle_sf,
                "capped_twins": tuple(capped_twins),
            }
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


def oracle_ceilings() -> dict[str, dict]:
    """Per-query oracle scale ceilings (see register(max_oracle_sf=…));
    consumed by tools/check_oracle.py's campaign skip logic."""
    _load()
    return {k: dict(v) for k, v in _ORACLE_CEILINGS.items()}


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
