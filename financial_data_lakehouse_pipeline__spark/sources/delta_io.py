"""Delta Lake sinks/scans — import-gated (delta-spark is not in this
container; everything here activates when it is installed, and fails with
an actionable error when it is not).

The parquet lake (writers.py) is the tested default; Delta adds the
lakehouse capabilities the parquet layout cannot express: ACID commits,
MERGE upserts (the idempotent daily-load primitive the reference
approximates with dynamic partition overwrite), and time travel.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def _require_delta() -> None:
    if not delta_available():
        raise RuntimeError(
            "delta-spark is not installed; install it and create the session "
            "with spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension "
            "and spark.sql.catalog.spark_catalog="
            "org.apache.spark.sql.delta.catalog.DeltaCatalog"
        )


def write_delta(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_cols: Sequence[str] = (),
) -> None:
    """Delta sink — the ACID replacement for the parquet writers."""
    _require_delta()
    w = df.write.format("delta").mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.save(path)


def read_delta(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    timestamp: str | None = None,
) -> DataFrame:
    """Delta scan with optional time travel (versionAsOf/timestampAsOf)."""
    _require_delta()
    r = spark.read.format("delta")
    if version is not None:
        r = r.option("versionAsOf", version)
    if timestamp is not None:
        r = r.option("timestampAsOf", timestamp)
    return r.load(path)


def upsert_delta(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: Sequence[str],
) -> None:
    """MERGE INTO upsert on the key columns — the idempotent incremental
    load primitive (matched rows update, new rows insert). The scalable
    replacement for the reference's overwrite-the-partition daily re-runs."""
    _require_delta()
    from delta.tables import DeltaTable

    target = DeltaTable.forPath(spark, path)
    cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
    (
        target.alias("t")
        .merge(updates.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
