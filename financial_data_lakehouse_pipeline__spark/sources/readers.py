"""Sources: parquet/JSON scans (SURVEY.md §2.1 S1-S2).

`read_table` is the canonical entry for the driver testdata: it normalizes
physical quirks (the `events` table's TIMESTAMP(NANOS) column) so operators
downstream always see clean logical types. Filters/projections applied by
callers still push down to the parquet scan — normalization is a column
rewrite, not a materialization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_lakehouse_pipeline__spark.session import tune_runtime

#: Tables the driver generates at each scale factor (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Plain parquet scan (reference data_transformation.py:51-52)."""
    tune_runtime(spark)
    return spark.read.parquet(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """JSON scan, schema-on-read (reference data_cleaning.py:45).

    Pass an explicit ``schema`` in production — inference costs an extra
    pass over the files and is input-dependent (SURVEY.md §1.2).
    """
    tune_runtime(spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table with normalized logical types.

    events.ts is stored as parquet TIMESTAMP(NANOS), which Spark reads
    (only) as a nanosecond LONG under spark.sql.legacy.parquet.nanosAsLong;
    we convert to a microsecond TimestampType via integer division — the
    same truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP, so
    oracle comparisons line up exactly.
    """
    tune_runtime(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
