"""Corpus: lake I/O paths — nested-JSON cleaning (S1/P2: the reference's
single biggest job, data_cleaning.py:45-168), parquet sink round-trips
(S3/S4), and subset dedup (A11).

The JSON queries run over a deterministic fixture written under
`.scratch/` at import time (same bytes every run), so the DuckDB oracle
can read the identical file with read_json. Array-of-structs explode
mirrors reference dc:48-61 (polygon `aggregates.results`); map explode
with two aliases mirrors dc:151-157 (alpha-vantage `time_series`).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_lakehouse_pipeline__spark.corpus import register, sql_dsum
from financial_data_lakehouse_pipeline__spark.functions import dsum
from financial_data_lakehouse_pipeline__spark.operators import cleaning
from financial_data_lakehouse_pipeline__spark.sources import (
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_table,
    write_csv,
    write_orc,
    write_parquet,
    write_partitioned_parquet,
)

_SCRATCH = os.path.join(os.path.dirname(__file__), "..", "..", ".scratch")
_SCRATCH = os.path.abspath(_SCRATCH)
_FIXTURES = os.path.join(_SCRATCH, "fixtures")

#: Deterministic raw-JSON fixture: array-of-structs (polygon shape,
#: reference dc:48-61) with a duplicate (ticker, bar) needing keep-latest
#: dedup and one invariant-violating bar (high < low) needing rejection.
_ARRAY_JSON = """\
{"ticker":"T1","extracted_at":"2024-01-02T10:00:00","aggregates":{"results":[{"t":1704153600000,"o":10.0,"h":12.0,"l":9.5,"c":11.0,"v":1000},{"t":1704240000000,"o":11.0,"h":11.5,"l":10.0,"c":10.5,"v":800}]}}
{"ticker":"T1","extracted_at":"2024-01-02T18:00:00","aggregates":{"results":[{"t":1704153600000,"o":10.0,"h":12.5,"l":9.5,"c":11.25,"v":1100}]}}
{"ticker":"T2","extracted_at":"2024-01-02T10:00:00","aggregates":{"results":[{"t":1704153600000,"o":20.0,"h":19.0,"l":21.0,"c":20.5,"v":500},{"t":1704240000000,"o":20.5,"h":22.0,"l":20.0,"c":21.5,"v":600}]}}
{"ticker":"T3","extracted_at":"2024-01-02T10:00:00","aggregates":null}
"""

#: Map<dateString, struct> fixture (alpha-vantage shape, reference
#: dc:151-157 — explode with two aliases).
_MAP_JSON = """\
{"symbol":"T1","time_series":{"2024-01-02":{"open":10.0,"close":11.0},"2024-01-03":{"open":11.0,"close":10.5}}}
{"symbol":"T2","time_series":{"2024-01-02":{"open":20.0,"close":20.5}}}
{"symbol":"T3","time_series":{}}
"""

_ARRAY_PATH = os.path.join(_FIXTURES, "raw_array.json")
_MAP_PATH = os.path.join(_FIXTURES, "raw_map.json")


def _write_fixtures() -> None:
    """Write fixtures idempotently (same bytes every run) so both engines
    read identical files regardless of which side runs first."""
    os.makedirs(_FIXTURES, exist_ok=True)
    for path, content in ((_ARRAY_PATH, _ARRAY_JSON), (_MAP_PATH, _MAP_JSON)):
        if not os.path.exists(path) or open(path).read() != content:
            with open(path, "w") as f:
                f.write(content)


_write_fixtures()

_ARRAY_SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        T.StructField("extracted_at", T.StringType()),
        T.StructField(
            "aggregates",
            T.StructType(
                [
                    T.StructField(
                        "results",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("t", T.LongType()),
                                    T.StructField("o", T.DoubleType()),
                                    T.StructField("h", T.DoubleType()),
                                    T.StructField("l", T.DoubleType()),
                                    T.StructField("c", T.DoubleType()),
                                    T.StructField("v", T.LongType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)

_MAP_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField(
            "time_series",
            T.MapType(
                T.StringType(),
                T.StructType(
                    [
                        T.StructField("open", T.DoubleType()),
                        T.StructField("close", T.DoubleType()),
                    ]
                ),
            ),
        ),
    ]
)

_ARRAY_DUCKDB_COLS = (
    "{ticker: 'VARCHAR', extracted_at: 'VARCHAR', "
    "aggregates: 'STRUCT(results STRUCT(t BIGINT, o DOUBLE, h DOUBLE, "
    "l DOUBLE, c DOUBLE, v BIGINT)[])'}"
)
_MAP_DUCKDB_COLS = (
    "{symbol: 'VARCHAR', "
    "time_series: 'MAP(VARCHAR, STRUCT(\"open\" DOUBLE, \"close\" DOUBLE))'}"
)


@register(
    "json_clean_array",
    f"""WITH raw AS (
          SELECT * FROM read_json('{_ARRAY_PATH}',
                                  format='newline_delimited',
                                  columns={_ARRAY_DUCKDB_COLS})
        ), exploded AS (
          SELECT ticker, extracted_at, unnest(aggregates.results) AS bar
          FROM raw WHERE aggregates.results IS NOT NULL
        ), flat AS (
          SELECT ticker, extracted_at,
                 CAST(make_timestamp(bar.t * 1000) AS DATE) AS bar_date,
                 bar.o AS open, bar.h AS high, bar.l AS low, bar.c AS close,
                 CAST(bar.v AS BIGINT) AS volume
          FROM exploded
        ), deduped AS (
          SELECT * FROM flat
          QUALIFY ROW_NUMBER() OVER (PARTITION BY ticker, bar_date
                                     ORDER BY extracted_at DESC) = 1
        )
        SELECT ticker, bar_date, open, high, low, close, volume,
               high - low AS price_range
        FROM deduped
        WHERE open IS NOT NULL AND close IS NOT NULL
          AND high >= low AND high >= open AND high >= close
          AND low <= open AND low <= close""",
)
def json_clean_array(spark, sf_dir):
    """S1+P2+P8+A10+P5/P6+P3: the reference's full polygon cleaning shape
    (dc:33-124) — nested-JSON scan, array explode, field extraction, epoch
    ms → date, keep-latest dedup, invariant filter, derived column."""
    raw = read_json(spark, _ARRAY_PATH, schema=_ARRAY_SCHEMA)
    exploded = cleaning.explode_array(
        raw.filter(F.col("aggregates.results").isNotNull()),
        "aggregates.results",
        alias="bar",
    )
    flat = exploded.select(
        "ticker",
        "extracted_at",
        F.timestamp_micros(F.col("bar.t") * 1000).cast("date").alias("bar_date"),
        F.col("bar.o").alias("open"),
        F.col("bar.h").alias("high"),
        F.col("bar.l").alias("low"),
        F.col("bar.c").alias("close"),
        F.col("bar.v").cast("bigint").alias("volume"),
    )
    deduped = cleaning.dedup_keep_latest(
        flat, ["ticker", "bar_date"], [F.col("extracted_at").desc()]
    )
    cleaned = cleaning.reject_nulls(deduped, ["open", "close"])
    cleaned = cleaning.filter_invariant(
        cleaned,
        (F.col("high") >= F.col("low"))
        & (F.col("high") >= F.col("open"))
        & (F.col("high") >= F.col("close"))
        & (F.col("low") <= F.col("open"))
        & (F.col("low") <= F.col("close")),
    )
    return cleaning.with_derived(
        cleaned, {"price_range": F.col("high") - F.col("low")}
    ).select(
        "ticker", "bar_date", "open", "high", "low", "close", "volume", "price_range"
    )


@register(
    "json_clean_map",
    f"""WITH raw AS (
          SELECT * FROM read_json('{_MAP_PATH}',
                                  format='newline_delimited',
                                  columns={_MAP_DUCKDB_COLS})
        ), entries AS (
          SELECT symbol, unnest(map_entries(time_series)) AS kv FROM raw
        )
        SELECT symbol,
               CAST(kv.key AS DATE) AS series_date,
               kv.value."open" AS open,
               kv.value."close" AS close
        FROM entries""",
)
def json_clean_map(spark, sf_dir):
    """S1+P2: map<string, struct> explode with key/value aliases — the
    alpha-vantage time_series shape (reference dc:151-168)."""
    raw = read_json(spark, _MAP_PATH, schema=_MAP_SCHEMA)
    exploded = cleaning.explode_map(raw, "time_series", "series_key", "series_val")
    return exploded.select(
        "symbol",
        F.col("series_key").cast("date").alias("series_date"),
        F.col("series_val.open").alias("open"),
        F.col("series_val.close").alias("close"),
    )


_ROUNDTRIP_SQL = f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem GROUP BY l_returnflag, l_linestatus"""


def _revenue_by_flag(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@register("parquet_roundtrip_partitioned", _ROUNDTRIP_SQL)
def parquet_roundtrip_partitioned(spark, sf_dir):
    """S3: hive-partitioned parquet sink → re-scan. The result must
    survive the partition-column round trip (l_returnflag becomes a
    directory key and is read back via partition discovery)."""
    path = os.path.join(_SCRATCH, "roundtrip_partitioned")
    write_partitioned_parquet(_revenue_by_flag(spark, sf_dir), path, ["l_returnflag"])
    back = read_parquet(spark, path)
    return back.select("l_returnflag", "l_linestatus", "n_lines", "revenue")


@register("parquet_roundtrip_plain", _ROUNDTRIP_SQL)
def parquet_roundtrip_plain(spark, sf_dir):
    """S4: unpartitioned parquet sink → re-scan (reference sa:103-104)."""
    path = os.path.join(_SCRATCH, "roundtrip_plain")
    write_parquet(_revenue_by_flag(spark, sf_dir), path)
    back = read_parquet(spark, path)
    return back.select("l_returnflag", "l_linestatus", "n_lines", "revenue")


@register("orc_roundtrip", _ROUNDTRIP_SQL)
def orc_roundtrip(spark, sf_dir):
    """ORC sink → re-scan: the columnar interchange contract holds
    across formats (sources.write_orc / read_orc) — same values, same
    types, same pushdown machinery as parquet."""
    path = os.path.join(_SCRATCH, "roundtrip_orc")
    write_orc(_revenue_by_flag(spark, sf_dir), path)
    back = read_orc(spark, path)
    return back.select("l_returnflag", "l_linestatus", "n_lines", "revenue")


@register("csv_roundtrip", _ROUNDTRIP_SQL)
def csv_roundtrip(spark, sf_dir):
    """CSV sink → typed re-scan (sources.write_csv / read_csv): the
    landing-zone contract — types survive only because the reader
    re-declares the schema explicitly. Doubles round-trip bit-exact
    (Spark writes shortest-round-trip decimal strings), which is why
    the revenue hash still matches the oracle."""
    path = os.path.join(_SCRATCH, "roundtrip_csv")
    df = _revenue_by_flag(spark, sf_dir)
    write_csv(df, path)
    back = read_csv(spark, path, schema=df.schema)
    return back.select("l_returnflag", "l_linestatus", "n_lines", "revenue")


@register(
    "dedup_by_subset_docs",
    "SELECT DISTINCT lang, source FROM documents",
)
def dedup_by_subset_docs(spark, sf_dir):
    """A11: dropDuplicates on a column subset (reference dc:251, dc:310).
    Projected to the subset columns so the surviving-row choice (which
    dropDuplicates leaves arbitrary) cannot affect the comparison."""
    d = read_table(spark, sf_dir, "documents")
    return cleaning.dedup_by_subset(d.select("lang", "source"), ["lang", "source"])


@register(
    "calendar_dimension",
    """SELECT CAST(d AS DATE) AS cal_date,
              CAST(EXTRACT(year FROM d) AS INT) AS year,
              CAST(EXTRACT(month FROM d) AS INT) AS month,
              CAST(EXTRACT(day FROM d) AS INT) AS day,
              CAST(EXTRACT(quarter FROM d) AS INT) AS quarter,
              CAST(EXTRACT(isodow FROM d) AS INT) AS iso_dow,
              EXTRACT(isodow FROM d) >= 6 AS is_weekend
       FROM (SELECT unnest(generate_series(DATE '2024-01-01',
                                           DATE '2024-12-31',
                                           INTERVAL 1 DAY)) AS d)""",
)
def calendar_dimension(spark, sf_dir):
    """Generated calendar dimension (no input table): one row per day of
    2024 with date parts and weekend flag — the date spine every
    financial mart joins against. Built from sequence() + explode; at
    scale a generated dimension beats scanning anything."""
    spark = spark
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-12-31").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("cal_date")
    )
    iso_dow = F.dayofweek(F.col("cal_date"))  # Sun=1..Sat=7
    iso_dow = F.when(iso_dow == 1, 7).otherwise(iso_dow - 1)  # ISO Mon=1..Sun=7
    return days.select(
        "cal_date",
        F.year("cal_date").cast("int").alias("year"),
        F.month("cal_date").cast("int").alias("month"),
        F.dayofmonth("cal_date").cast("int").alias("day"),
        F.quarter("cal_date").cast("int").alias("quarter"),
        iso_dow.cast("int").alias("iso_dow"),
        (iso_dow >= 6).alias("is_weekend"),
    )


@register(
    "skew_report_events",
    """WITH k AS (
          SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
        ),
        t AS (SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM k)
        SELECT user_id,
               CAST(n AS BIGINT) AS n_rows,
               CAST(n AS DOUBLE) / total AS share,
               CAST(n AS DOUBLE) / (CAST(total AS DOUBLE) / n_keys)
                   AS x_mean
        FROM k CROSS JOIN t
        ORDER BY n DESC, user_id LIMIT 10""",
)
def skew_report_events(spark, sf_dir):
    """Join/agg skew diagnostic: the 10 heaviest keys with their row
    share and multiple-of-mean — the report that decides between AQE
    skew-join, salting, or a broadcast redesign. One keyed count + a
    1-row global broadcast; top-k plans TakeOrderedAndProject."""
    e = read_table(spark, sf_dir, "events")
    k = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    t = k.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        k.crossJoin(F.broadcast(t))
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_rows"),
            (F.col("n").cast("double") / F.col("total")).alias("share"),
            (
                F.col("n").cast("double")
                / (F.col("total").cast("double") / F.col("n_keys"))
            ).alias("x_mean"),
        )
        .orderBy(F.col("n_rows").desc(), "user_id")
        .limit(10)
    )


@register(
    "supplier_date_gaps",
    """WITH act AS (
         SELECT DISTINCT l_suppkey, l_shipdate AS day FROM lineitem
       ),
       r AS (
         SELECT l_suppkey, MIN(day) AS d0, MAX(day) AS d1
         FROM act GROUP BY l_suppkey
       ),
       spine AS (
         SELECT l_suppkey, CAST(day AS DATE) AS day
         FROM (SELECT l_suppkey,
                      UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
               FROM r)
       )
       SELECT s.l_suppkey, s.day AS missing_day
       FROM spine s
       WHERE NOT EXISTS (SELECT 1 FROM act a
                         WHERE a.l_suppkey = s.l_suppkey AND a.day = s.day)""",
)
def supplier_date_gaps(spark, sf_dir):
    """Missing trading days per supplier inside each supplier's own
    activity range (operators/dq.date_gaps): generated per-entity date
    spine + LEFT ANTI join — the completeness report feeding
    gap_fill_events."""
    from financial_data_lakehouse_pipeline__spark.operators import dq

    li = read_table(spark, sf_dir, "lineitem")
    return dq.date_gaps(li, ["l_suppkey"], F.col("l_shipdate").cast("date"))


@register(
    "schema_evolution_scan",
    # The merged scan over v1 (no discount col) + v2 (added col) equals
    # the explicit union with NULL fill — additive schema evolution.
    """WITH v1 AS (
          SELECT o_orderkey, o_totalprice, CAST(NULL AS DOUBLE) AS o_discnt
          FROM orders WHERE o_orderkey % 2 = 0
        ), v2 AS (
          SELECT o_orderkey, o_totalprice,
                 CAST(o_orderkey % 10 AS DOUBLE) / 100e0 AS o_discnt
          FROM orders WHERE o_orderkey % 2 = 1
        )
        SELECT * FROM v1 UNION ALL SELECT * FROM v2""",
)
def schema_evolution_scan(spark, sf_dir):
    """Additive schema evolution on the lake (mergeSchema=true): batch 1
    wrote (o_orderkey, o_totalprice); batch 2 added an o_discnt column.
    One merged scan reads both vintages, old files NULL-filled — the
    contract that lets a 100 TB lake add columns without rewriting
    history. Written idempotently to .scratch so both engines see the
    same bytes."""
    evo = os.path.join(_SCRATCH, "schema_evolution")
    o = read_table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_totalprice",
        ((F.col("o_orderkey") % 10).cast("double") / F.lit(100.0)).alias("o_discnt"),
    )
    v1.write.mode("overwrite").parquet(os.path.join(evo, "batch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(evo, "batch=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(evo, "batch=1"), os.path.join(evo, "batch=2")
    )
    return merged.select("o_orderkey", "o_totalprice", "o_discnt")


@register(
    "dpp_partitioned_revenue",
    f"""WITH yrs AS (
          SELECT DISTINCT CAST(EXTRACT(year FROM o_orderdate) AS INT)
                   AS ship_year
          FROM orders WHERE o_orderdate >= DATE '1996-01-01'
        )
        SELECT y.ship_year,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem l
        JOIN yrs y
          ON CAST(EXTRACT(year FROM l.l_shipdate) AS INT) = y.ship_year
        GROUP BY y.ship_year""",
)
def dpp_partitioned_revenue(spark, sf_dir):
    """Dynamic-partition-pruned fact scan: lineitem is laid out as a
    hive-partitioned lake table (ship_year directories, written
    idempotently per sf), then joined to a RUNTIME-ONLY dim (the ship
    years reachable from recent orders — unknown until the dim scan
    runs). Catalyst plans a dynamicpruning subquery on the partition
    column, so only the reachable year directories are scanned — at
    100 TB the difference between reading every date partition and the
    ~40% the dim selects. Plan asserted in tests/test_plans.py
    (PartitionFilters + dynamicpruning); the oracle recomputes from the
    unpartitioned source, proving the partition round-trip lossless."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    lake = os.path.join(_SCRATCH, "dpp_lake_v1", tag, "lineitem_by_year")
    if not os.path.exists(os.path.join(lake, "_SUCCESS")):
        li = read_table(spark, sf_dir, "lineitem").select(
            "l_extendedprice",
            "l_discount",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        write_partitioned_parquet(li, lake, ["ship_year"])
    # explicit schema: an EMPTY source writes zero part files, and a
    # schema-less read of the bare directory cannot infer one
    fact = spark.read.schema(
        "l_extendedprice double, l_discount double, ship_year int"
    ).parquet(lake)
    dim = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        .select(F.year("o_orderdate").cast("int").alias("ship_year"))
        .distinct()
    )
    return fact.join(dim, "ship_year").groupBy("ship_year").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
    )


@register(
    "sql_vectorized_udf",
    # The registered pandas UDF is pure arithmetic, so the oracle is the
    # same closed form in plain SQL.
    """SELECT o_orderkey,
              (o_totalprice - 151244.0) / 151244.0 AS rel_price
       FROM orders""",
)
def sql_vectorized_udf(spark, sf_dir):
    """Vectorized (Arrow) UDF registered into the SQL catalog
    (spark.udf.register + pandas_udf) and invoked from a spark.sql
    string — the §2.10 surface for SQL-first users. The kernel is
    batch-at-a-time pandas (never row-at-a-time Python); the oracle is
    the equivalent closed form."""
    from pyspark.sql.functions import pandas_udf

    def _rel(v):  # batch-at-a-time: v is a pandas Series
        anchor = 151244.0
        return (v - anchor) / anchor

    # explicit (fn, returnType) form: the module uses future annotations,
    # which breaks pandas_udf's type-hint introspection on nested defs
    spark.udf.register("rel_price", pandas_udf(_rel, "double"))
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("__orders_udf")
    return spark.sql(
        "SELECT o_orderkey, rel_price(o_totalprice) AS rel_price FROM __orders_udf"
    )


@register(
    "grouped_udaf_geomean",
    # The UDAF kernel has a deliberate closed form, so the oracle is the
    # same weighted log-mean in plain SQL. log_wgm (~10.5 magnitude,
    # float-sum error ~1e-12) rounds at 6; the exp()-amplified geomean
    # (~4e4 magnitude, ~1e-9 abs error) rounds at 4 — both comfortably
    # inside their rounding-tie margins.
    """SELECT l_returnflag, l_linestatus,
              ROUND(SUM(l_quantity * ln(l_extendedprice))
                    / SUM(l_quantity), 6) + 0e0 AS log_wgm,
              ROUND(exp(SUM(l_quantity * ln(l_extendedprice))
                        / SUM(l_quantity)), 4) + 0e0 AS wgm
       FROM lineitem
       GROUP BY l_returnflag, l_linestatus""",
)
def grouped_udaf_geomean(spark, sf_dir):
    """Quantity-weighted geometric mean price per (returnflag,
    linestatus) via a GROUPED_AGG pandas UDAF
    (functions/udafs.weighted_log_mean) — completing the §2.10 UDF
    triple (scalar pandas_udf + UDTF + grouped-aggregate UDAF). The
    kernel sees each group's columns as Arrow-batched pandas Series and
    returns one scalar; the plan is a single AggregateInPandas over one
    hash-partition exchange (asserted in tests/test_plans.py). Spark
    rejects mixing a GROUPED_AGG UDAF with non-pandas aggregates in one
    agg() (INVALID_PANDAS_UDF_PLACEMENT), so the UDAF is the sole
    aggregate here. The closed form exists on purpose — it is the
    exact SQL twin."""
    from financial_data_lakehouse_pipeline__spark.functions.udafs import (
        weighted_log_mean,
    )

    li = read_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        weighted_log_mean(
            F.col("l_extendedprice").cast("double"),
            F.col("l_quantity").cast("double"),
        ).alias("__lm"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        (F.round(F.col("__lm"), 6) + F.lit(0.0)).alias("log_wgm"),
        (F.round(F.exp("__lm"), 4) + F.lit(0.0)).alias("wgm"),
    )


@register(
    "lake_file_stats",
    # Footer-only parity: DuckDB's parquet_file_metadata /
    # parquet_metadata read the same footers pyarrow does.
    """SELECT f.file_name,
              CAST(f.num_rows AS BIGINT) AS num_rows,
              CAST(f.num_row_groups AS BIGINT) AS num_row_groups,
              CAST(c.n_columns AS INT) AS n_columns,
              CAST(c.compressed_bytes AS BIGINT) AS compressed_bytes
       FROM parquet_file_metadata('/root/testdata/sf0.01/*.parquet') f
       JOIN (
         SELECT file_name,
                COUNT(DISTINCT path_in_schema) AS n_columns,
                SUM(total_compressed_size) AS compressed_bytes
         FROM parquet_metadata('/root/testdata/sf0.01/*.parquet')
         GROUP BY file_name
       ) c USING (file_name)""",
)
def lake_file_stats(spark, sf_dir):
    """Distributed parquet-footer audit (sources/inspect.file_stats):
    per-file rows, row groups, columns, and compressed footprint — the
    lake-health report that never scans a data page. Footer reads fan
    out via mapInPandas over the file list; DuckDB's parquet_metadata
    functions are the oracle. Both sides inspect the FIXED sf0.01
    directory (the oracle SQL embeds a literal path — same pattern as
    the JSON fixtures), so the comparison is sf_dir-independent."""
    from financial_data_lakehouse_pipeline__spark.sources import TABLES, inspect

    fixed = "/root/testdata/sf0.01"
    paths = [
        p
        for p in inspect.table_paths(fixed, list(TABLES))
        if os.path.exists(p)
    ]
    return inspect.file_stats(spark, paths)


@register(
    "compaction_plan_lake",
    # Footer-only twin over the same FIXED sf0.01 files (lake_file_stats
    # pattern): identical name-ordered exclusive running sum and integer
    # DIV grouping — deterministic, no floats anywhere.
    """WITH f AS (
          SELECT f.file_name, CAST(c.compressed_bytes AS BIGINT) AS b
          FROM parquet_file_metadata('/root/testdata/sf0.01/*.parquet') f
          JOIN (SELECT file_name,
                       SUM(total_compressed_size) AS compressed_bytes
                FROM parquet_metadata('/root/testdata/sf0.01/*.parquet')
                GROUP BY file_name) c USING (file_name)
        ), g AS (
          SELECT file_name, b,
                 CAST(COALESCE(SUM(b) OVER (ORDER BY file_name
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) // 524288 AS BIGINT)
                   AS compaction_group
          FROM f
        )
        SELECT compaction_group, CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(b) AS BIGINT) AS group_bytes,
               MIN(file_name) AS first_file, MAX(file_name) AS last_file
        FROM g GROUP BY 1""",
)
def compaction_plan_lake(spark, sf_dir):
    """Small-file compaction plan for the fixed sf0.01 lake directory
    (sources/inspect.compaction_plan, 512 KiB target): name-ordered
    greedy grouping by exclusive running byte total DIV target — the
    maintenance pass that re-packs a fragmented table into target-sized
    files without reading a data page. Footer reads fan out via
    mapInPandas; the planning window is file-count bounded
    (metadata-sized). Both engines inspect the same fixed directory
    (lake_file_stats pattern), so the plan is sf_dir-independent."""
    import os as _os

    from financial_data_lakehouse_pipeline__spark.sources import (
        TABLES,
        inspect,
    )

    fixed = "/root/testdata/sf0.01"
    paths = [
        p
        for p in inspect.table_paths(fixed, list(TABLES))
        if _os.path.exists(p)
    ]
    st = inspect.file_stats(spark, paths)
    return inspect.compaction_plan(st, target_bytes=512 * 1024)


@register(
    "python_datasource_scan",
    # The source's rows are a pure function of the row id, so the twin
    # is range() arithmetic: bucket = id % 8, v = (id * 37) % 997.
    # Per-bucket sums stay exact BIGINTs; avg is one IEEE division.
    """WITH r AS (
          SELECT i AS id, CAST(i % 8 AS INT) AS bucket,
                 (i * 37) % 997 AS v
          FROM (SELECT unnest(range(0, 1000)) AS i)
        )
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS v_sum,
               CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS v_avg
        FROM r GROUP BY bucket""",
)
def python_datasource_scan(spark, sf_dir):
    """Custom Python DataSource scan (Spark 4 DataSource API,
    sources/pyds.SyntheticRowsDataSource): a pure-Python pluggable
    source scheduled one-task-per-InputPartition like any native scan —
    the source-side §2.10 surface beside the UDF/UDTF/UDAF trio. 1000
    deterministic rows over 4 partitions, aggregated per bucket; the
    oracle reproduces the scan from range() arithmetic because rows are
    a pure function of the row id."""
    from financial_data_lakehouse_pipeline__spark.sources import pyds

    pyds.register(spark)
    df = (
        spark.read.format("synthetic_rows")
        .option("rows", 1000)
        .option("partitions", 4)
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("v_sum"),
        (
            F.sum("v").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("v_avg"),
    )
