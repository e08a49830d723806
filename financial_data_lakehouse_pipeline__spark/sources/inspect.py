"""Lake inspection: distributed parquet-footer statistics (engine
extension — the lake-health audit every 100 TB estate needs: file-size
skew, row-group sizing, per-column compressed footprint, all WITHOUT
scanning data pages).

Footer reads are distributed via mapInPandas over the FILE LIST (one
row per file), so a million-file lake fans out across executors and
each task reads only footers (KBs per file). Nothing touches the driver
beyond the final small stats table.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Output schema of file_stats.
FILE_STATS_SCHEMA = (
    "file_name string, num_rows bigint, num_row_groups bigint, "
    "n_columns int, compressed_bytes bigint"
)

#: Output schema of column_stats.
COLUMN_STATS_SCHEMA = (
    "file_name string, column string, compressed_bytes bigint, "
    "uncompressed_bytes bigint"
)


def _paths_df(spark: SparkSession, paths: list[str]) -> DataFrame:
    return spark.createDataFrame([(p,) for p in sorted(paths)], "path string")


def file_stats(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Per-file footer stats: rows, row groups, columns, total
    compressed bytes. One footer read per file, distributed."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in it:
            rows = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                comp = sum(
                    md.row_group(g).column(c).total_compressed_size
                    for g in range(md.num_row_groups)
                    for c in range(md.num_columns)
                )
                rows.append(
                    (p, md.num_rows, md.num_row_groups, md.num_columns, comp)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_name",
                    "num_rows",
                    "num_row_groups",
                    "n_columns",
                    "compressed_bytes",
                ],
            )

    return _paths_df(spark, paths).mapInPandas(_batches, schema=FILE_STATS_SCHEMA)


def column_stats(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Per-(file, column) compressed/uncompressed byte footprint — the
    input to column-pruning and encoding audits (which columns pay for
    the scan, which compress badly)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in it:
            rows = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                agg: dict[str, list[int]] = {}
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    for c in range(md.num_columns):
                        col = rg.column(c)
                        cur = agg.setdefault(col.path_in_schema, [0, 0])
                        cur[0] += col.total_compressed_size
                        cur[1] += col.total_uncompressed_size
                for name, (comp, uncomp) in agg.items():
                    rows.append((p, name, comp, uncomp))
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_name",
                    "column",
                    "compressed_bytes",
                    "uncompressed_bytes",
                ],
            )

    return _paths_df(spark, paths).mapInPandas(_batches, schema=COLUMN_STATS_SCHEMA)


def table_paths(sf_dir: str, tables: list[str]) -> list[str]:
    """Resolve the driver-testdata single-file-per-table layout."""
    return [os.path.join(sf_dir, f"{t}.parquet") for t in tables]


def compaction_plan(
    stats: DataFrame, target_bytes: int
) -> DataFrame:
    """Small-file compaction planning over a :func:`file_stats` table —
    the lake-maintenance pass that turns a fragmented 100 TB table back
    into target-sized files: walk files in name order, open a new
    output group whenever the running byte total crosses
    ``target_bytes``. group = (exclusive running sum of
    compressed_bytes) DIV target — pure integer arithmetic, so the
    plan is deterministic and cross-engine exact.

    The single-partition window is bounded by FILE COUNT (a metadata
    table, not data — the same aggregate-then-scan bound as the
    distinct-value histograms, SCALE.md §5); a billion-file lake would
    first shard this by table/partition prefix.

    Output: (compaction_group, n_files, group_bytes, first_file,
    last_file), one row per planned output file.
    """
    if int(target_bytes) <= 0:
        raise ValueError(
            f"target_bytes must be a positive integer, got {target_bytes}: "
            "`DIV 0` silently yields one NULL compaction group"
        )
    # The exclusive running sum lives in ONE place — the inline OVER
    # clause below (integer DIV needs F.expr anyway; a parallel
    # Window object would just be a second ordering spec to drift).
    g = stats.select(
        "file_name",
        F.col("compressed_bytes").cast("bigint").alias("__b"),
    ).withColumn(
        "compaction_group",
        F.expr(
            f"CAST(coalesce(sum(__b) OVER (ORDER BY file_name "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            f"DIV {int(target_bytes)} AS BIGINT)"
        ),
    )
    return (
        g.groupBy("compaction_group")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("__b").cast("bigint").alias("group_bytes"),
            F.min("file_name").alias("first_file"),
            F.max("file_name").alias("last_file"),
        )
    )
