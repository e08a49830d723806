"""Pin storage posture (round 14, VERDICT r13 #7 / ADVICE r13): the
session-level SPARK_GRAFT_PIN_MODE switch and the explicit block release
for superseded pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_data_lakehouse_pipeline__spark.operators import dedup


@pytest.fixture()
def small_df(spark):
    return spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )


def _plan_name(df) -> str:
    return df._jdf.queryExecution().logical().getClass().getSimpleName()


def test_pin_default_is_local_checkpoint(small_df, monkeypatch):
    monkeypatch.delenv(dedup.PIN_MODE_ENV, raising=False)
    pinned = dedup._pin(small_df)
    # a (lazy) localCheckpoint rewrites the plan to a LogicalRDD leaf
    assert _plan_name(pinned) == "LogicalRDD"
    assert pinned.count() == 100


def test_pin_mode_off_keeps_full_lineage(small_df, monkeypatch):
    monkeypatch.setenv(dedup.PIN_MODE_ENV, "off")
    pinned = dedup._pin(small_df)
    assert pinned is small_df  # the global kill switch: no-op


def test_pin_disabled_flag_keeps_full_lineage(small_df, monkeypatch):
    monkeypatch.delenv(dedup.PIN_MODE_ENV, raising=False)
    assert dedup._pin(small_df, enabled=False) is small_df


def test_pin_mode_replicated_persists_with_two_replicas(small_df, monkeypatch):
    monkeypatch.setenv(dedup.PIN_MODE_ENV, "replicated")
    pinned = dedup._pin(small_df)
    lvl = pinned.storageLevel
    # MEMORY_AND_DISK_2: lineage kept (recompute possible), 2 replicas —
    # the executor-loss-tolerant variant for corpus-sized pins
    assert lvl.replication == 2
    assert lvl.useMemory and lvl.useDisk
    assert pinned.count() == 100
    pinned.unpersist()


def test_pin_mode_reliable_checkpoints(small_df, monkeypatch, tmp_path):
    spark = small_df.sparkSession
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    monkeypatch.setenv(dedup.PIN_MODE_ENV, "reliable")
    pinned = dedup._pin(small_df)
    assert _plan_name(pinned) == "LogicalRDD"
    assert pinned.count() == 100


def test_pin_modes_produce_identical_results(small_df, monkeypatch):
    expected = sorted(r["k"] for r in small_df.collect())
    for mode in ("local", "replicated", "off"):
        monkeypatch.setenv(dedup.PIN_MODE_ENV, mode)
        got = sorted(r["k"] for r in dedup._pin(small_df).collect())
        assert got == expected, mode


def test_release_pin_frees_materialized_blocks(small_df, monkeypatch):
    monkeypatch.delenv(dedup.PIN_MODE_ENV, raising=False)
    pinned = dedup._pin(small_df)
    assert pinned.count() == 100  # materialize the lazy checkpoint
    rdd = pinned._jdf.queryExecution().logical().rdd()
    assert rdd.getStorageLevel().useMemory() or rdd.getStorageLevel().useDisk()
    dedup._release_pin(pinned)
    lvl = rdd.getStorageLevel()
    assert not (lvl.useMemory() or lvl.useDisk())


def test_release_pin_is_safe_on_unpinned_frames(small_df):
    # best-effort contract: arbitrary plans (no LogicalRDD) are a no-op
    dedup._release_pin(small_df)
    assert small_df.count() == 100
