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


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan. Same columnar pushdown/pruning contract as parquet
    (predicate pushdown, column pruning, vectorized read are all native
    Spark) — the interchange format choice is a config concern, not an
    engine one."""
    tune_runtime(spark)
    return spark.read.orc(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV scan with an explicit schema (the production contract —
    inference costs an extra pass AND silently widens types; the
    landing-zone pattern is CSV in, typed columnar out, see
    write_parquet). Pushdown note: CSV supports column pruning but not
    predicate pushdown to the scan — another reason it is a landing
    format, never the query format.
    """
    tune_runtime(spark)
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """JSON scan, schema-on-read (reference data_cleaning.py:45).

    Pass an explicit ``schema`` in production — inference costs an extra
    pass over the files and is input-dependent (SURVEY.md §1.2).

    Malformed-record contract (real feeds always contain some):
    ``mode="PERMISSIVE"`` (default) nulls unparseable fields;
    additionally pass ``corrupt_col`` to capture each bad line verbatim
    in that column (quarantine-and-continue — the landing-zone pattern:
    filter the corrupt rows to a reject sink, ingest the rest).
    ``mode="DROPMALFORMED"`` silently drops bad lines;
    ``mode="FAILFAST"`` raises on the first one. With ``corrupt_col``
    an explicit ``schema`` is required (Spark's contract: the corrupt
    column must be declared in it — this helper appends it for you).
    """
    tune_runtime(spark)
    reader = spark.read.option("mode", mode)
    if corrupt_col is not None:
        if schema is None:
            raise ValueError("corrupt_col requires an explicit schema")
        schema = T.StructType(
            [*schema.fields, T.StructField(corrupt_col, T.StringType(), True)]
        )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-zoned ``TimestampType``
    (microseconds) regardless of the physical parquet encoding.

    The driver testdata has shipped ``events.ts`` under three different
    physical types across rounds, so this contract is pinned here (and
    property-tested in tests/test_sources.py):

    - ``int64`` TIMESTAMP(NANOS) read as a nanosecond LONG under
      ``spark.sql.legacy.parquet.nanosAsLong`` → integer-divide to micros
      (same truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP).
    - ``timestamp[us]`` without tz metadata, which Spark 4 reads as
      ``TIMESTAMP_NTZ`` → cast to TimestampType. The session timezone is
      pinned UTC (session.py), so the wall-clock value maps to the
      identical instant and oracle hashes are unchanged.
    - already ``TimestampType`` → pass through.

    Works on batch and streaming DataFrames alike (pure column rewrite).
    """
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast(T.TimestampType()))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table with normalized logical types.

    events.ts physical encoding has drifted across driver rounds (nanos
    LONG, then timestamp[us]/NTZ); ``normalize_event_ts`` maps every
    variant to session-zoned TimestampType micros so operators downstream
    always see one logical type.
    """
    tune_runtime(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def scan_parallelism_floor(df: DataFrame) -> DataFrame:
    """Raise an under-split input's partition count to the session's
    default parallelism before per-row-HEAVY map work (regex tokenize,
    per-shingle md5, quality screens).

    A parquet file splits at ROW-GROUP granularity, and the driver
    testdata (like any small compacted lake table) is one file with one
    row group per table — so the whole scan is ONE task and everything
    up to the first exchange runs on one core no matter how many the
    session has (guide §6: input split size bounds scan parallelism;
    round 14 measured the docs-family tokenize stages single-task at
    every SF, e.g. word_shingles 0.55 s → 0.32 s at sf0.1 and the whole
    sf1 heavy family faster on 8 cores than 32 because the serial scan
    stage dominated). The round-robin repartition costs one shuffle of
    the raw rows, which only pays when downstream per-row work
    dominates the row bytes — callers are the tokenize/hash-heavy text
    operators, nothing else.

    Scale posture: the floor only engages when the scan is under-split
    by 2x or more versus the session's core count, so real lake inputs
    (thousands of splits) pass through untouched — no added corpus
    shuffle at 100 TB; it self-tunes to SPARK_GRAFT_CPUS locally and to
    the executor fleet on a cluster.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # exotic plans (no RDD view): leave untouched
        return df
    if n * 2 > target:
        return df
    return df.repartition(target)


def with_ingest_metadata(df: DataFrame, source: str) -> DataFrame:
    """Stamp lake-ingest audit columns — the provenance contract every
    multi-source lake needs for debugging, replay, and per-file
    quarantine (the reference carries the same idea as its partitioned
    year=/month= layout plus job-level logging; here it is row-level):

    - ``_source``   — logical source name (the extractor/feed id)
    - ``_input_file`` — physical file the row came from
      (``input_file_name()`` — populated during the scan, constant-cost)
    - ``_ingest_ts``  — processing-time stamp (``current_timestamp()``,
      one value per query execution, NOT per row — deterministic within
      a run)

    Pure metadata projection: no shuffle, no UDF; columns prefixed with
    ``_`` so they sort apart from data columns and are easy to drop
    before serving."""
    return df.withColumns(
        {
            "_source": F.lit(source),
            "_input_file": F.input_file_name(),
            "_ingest_ts": F.current_timestamp(),
        }
    )
