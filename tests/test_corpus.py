"""Corpus-wide differential test at sf0.001: every query with an oracle
must match DuckDB on row-count + column names + value multiset — the
fast local twin of the driver's sf0.01 CORRECTNESS gate."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import normalize  # noqa: E402

from financial_data_lakehouse_pipeline__spark import corpus  # noqa: E402
from financial_data_lakehouse_pipeline__spark.sources import TABLES  # noqa: E402

_QUERIES = corpus.queries()
_ORACLES = corpus.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def test_every_oracle_has_a_query():
    assert set(_ORACLES) <= set(_QUERIES)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    df = _QUERIES[name](spark, sf_dir)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    cur = duck.execute(_ORACLES[name])
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert normalize(s_rows, s_cols) == normalize(d_rows, d_cols)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_every_query_handles_empty_input(spark, tmp_path):
    """Robustness sweep: all corpus queries must run (not crash) on
    zero-row tables with the production schemas — guards window/agg/
    join/explode edge cases on empty partitions."""
    import os

    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path / "sf_empty")
    os.makedirs(dst)
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            schema = pq.read_schema(os.path.join(src, f))
            pq.write_table(schema.empty_table(), os.path.join(dst, f))

    failures = []
    for name, fn in sorted(corpus.queries().items()):
        try:
            fn(spark, dst).count()
        except Exception as e:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {str(e).splitlines()[0][:120]}")
    assert not failures, failures
