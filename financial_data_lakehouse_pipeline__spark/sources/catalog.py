"""Catalog: temp-view registry + external tables over the lake
(SURVEY.md §2.1 S5, S6, S9).

The reference catalogs its lake with Hive external tables, MSCK REPAIR
after each load, and ANALYZE for CBO statistics
(sql/hive_schemas.sql:17-163, :301-306, :312-314;
scripts/utils/hive_utils.py:208-225, :360-377). Here the quick path is
temp views over parquet; `create_external_table` + `repair_table` +
`analyze_table` provide the durable-catalog equivalents — on a real
cluster these become Hive-metastore tables with partition discovery and
cost-based-optimizer statistics.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

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


def create_external_table(
    spark: SparkSession,
    name: str,
    location: str,
    schema: Mapping[str, str],
    partitioned_by: Sequence[str] = (),
) -> None:
    """S5: external parquet table over an existing lake directory
    (reference hive_schemas.sql:17-36). ``schema`` maps every column
    (including partition columns) → SQL type; ``partitioned_by`` names the
    hive-layout directory keys. Newly created partitioned tables know no
    partitions until ``repair_table`` runs — exactly the reference's
    load-then-MSCK contract."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    cols = ", ".join(f"{c} {t}" for c, t in schema.items())
    part = f" PARTITIONED BY ({', '.join(partitioned_by)})" if partitioned_by else ""
    spark.sql(
        f"CREATE TABLE {name} ({cols}) USING PARQUET{part} LOCATION '{location}'"
    )


def repair_table(spark: SparkSession, name: str) -> None:
    """S6: discover hive-layout partition directories
    (reference MSCK REPAIR, hive_schemas.sql:301-306;
    hive_utils.py:208-225)."""
    spark.sql(f"MSCK REPAIR TABLE {name}")


def analyze_table(
    spark: SparkSession, name: str, columns: Sequence[str] = ()
) -> None:
    """S9: compute table (and optionally column) statistics — CBO food
    for join reordering and broadcast decisions
    (reference hive_schemas.sql:312-314; hive_utils.py:360-377)."""
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}")
