"""Catalog: temp-view registry over the lake (SURVEY.md §2.1 S5-S6).

The reference catalogs its lake with Hive external tables + MSCK REPAIR
(sql/hive_schemas.sql:17-163,301-306). In this engine the same role is
played by temp views over parquet — `spark.sql` queries and the SQL view
layer (operators/sql_views.py) run against these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from financial_data_lakehouse_pipeline__spark.sources.readers import TABLES, read_table


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each testdata table as a temp view named after itself."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
