"""ACID table format (sources/acid.py): atomic commits, snapshot
isolation / time travel, file-pruned MERGE and DELETE copy-on-write,
optimistic-concurrency conflict detection, idempotent replay, vacuum."""

from __future__ import annotations

import json
import os

import pytest

from financial_data_lakehouse_pipeline__spark.sources import acid


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k int, v string, amt double")


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "acid_table")


def test_create_append_time_travel(spark, root):
    v0 = acid.create_table(_mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]), root)
    v1 = acid.append(_mk(spark, [(3, "c", 3.0)]), root)
    assert (v0, v1) == (0, 1)
    assert acid.latest_version(root) == 1
    # latest
    got = sorted(r["k"] for r in acid.read_snapshot(spark, root).collect())
    assert got == [1, 2, 3]
    # time travel to v0
    got0 = sorted(
        r["k"] for r in acid.read_snapshot(spark, root, version=0).collect()
    )
    assert got0 == [1, 2]
    # time travel by timestamp: just after v0's commit_ts
    entries = acid._read_log(root)
    ts0 = entries[0]["commit_ts"]
    got_ts = sorted(
        r["k"]
        for r in acid.read_snapshot(spark, root, timestamp=ts0).collect()
    )
    assert got_ts == [1, 2]
    with pytest.raises(acid.NoSuchVersionError):
        acid.read_snapshot(spark, root, timestamp=ts0 - 1000.0)
    with pytest.raises(acid.NoSuchVersionError):
        acid.read_snapshot(spark, root, version=99)


def test_append_schema_drift_rejected(spark, root):
    acid.create_table(_mk(spark, [(1, "a", 1.0)]), root)
    bad = spark.createDataFrame([(2, "b")], "k int, v string")
    with pytest.raises(ValueError, match="schema drift"):
        acid.append(bad, root)


def test_merge_upsert_semantics_and_file_pruning(spark, root):
    # two separate appends -> at least two data files; merge touches only
    # the file(s) holding matched keys
    acid.create_table(_mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]), root)
    acid.append(_mk(spark, [(10, "x", 10.0), (11, "y", 11.0)]), root)
    files_before = set(acid.snapshot_files(root))
    assert len(files_before) >= 2
    updates = _mk(spark, [(2, "B!", 20.0), (99, "new", 99.0)])
    acid.merge(spark, root, updates, ["k"])
    got = {r["k"]: (r["v"], r["amt"]) for r in
           acid.read_snapshot(spark, root).collect()}
    assert got == {
        1: ("a", 1.0), 2: ("B!", 20.0),
        10: ("x", 10.0), 11: ("y", 11.0), 99: ("new", 99.0),
    }
    # file pruning: the v1 append files (keys 10,11 — unmatched) must
    # survive BY REFERENCE in the new snapshot
    entries = acid._read_log(root)
    removed = set(entries[-1]["removes"])
    files_after = set(acid.snapshot_files(root))
    v1_files = set(entries[1]["adds"])
    assert v1_files & files_after == v1_files  # untouched, still live
    assert removed and removed.isdisjoint(v1_files)


def test_merge_conflict_detection(spark, root, monkeypatch):
    acid.create_table(_mk(spark, [(1, "a", 1.0)]), root)
    # simulate a concurrent writer landing between merge's snapshot read
    # and its commit: patch _write_data to append first
    real_write = acid._write_data

    def race_write(df, r, hint):
        out = real_write(df, r, hint)
        # interleave a concurrent append once, then restore
        monkeypatch.setattr(acid, "_write_data", real_write)
        acid.append(_mk(spark, [(7, "z", 7.0)]), r)
        return out

    monkeypatch.setattr(acid, "_write_data", race_write)
    with pytest.raises(acid.ConcurrentCommitError):
        acid.merge(spark, root, _mk(spark, [(1, "A", 5.0)]), ["k"])
    # the table is intact: the interleaved append won, merge left no trace
    got = sorted(r["k"] for r in acid.read_snapshot(spark, root).collect())
    assert got == [1, 7]


def test_commit_o_excl_race_raises(spark, root):
    acid.create_table(_mk(spark, [(1, "a", 1.0)]), root)
    # handcraft the next version file to occupy the slot
    nxt = acid._entry_path(root, 1)
    with open(nxt, "w") as f:
        json.dump(
            {"version": 1, "op": "append", "adds": [], "removes": [],
             "schema": acid._read_log(root)[0]["schema"],
             "commit_ts": 0.0, "app_txn_id": None, "op_params": {}},
            f,
        )
    with pytest.raises(acid.ConcurrentCommitError):
        acid._commit(root, "merge", [], [], "{}", expected_version=1)


def test_idempotent_replay(spark, root):
    acid.create_table(_mk(spark, [(1, "a", 1.0)]), root)
    v = acid.append(_mk(spark, [(2, "b", 2.0)]), root, app_txn_id="batch-7")
    assert v == 1
    # replaying the same app txn is a no-op (returns -1, no new version)
    v2 = acid.append(_mk(spark, [(2, "b", 2.0)]), root, app_txn_id="batch-7")
    assert v2 == -1
    assert acid.latest_version(root) == 1
    assert acid.read_snapshot(spark, root).count() == 2


def test_delete_where_and_empty_snapshot_schema(spark, root):
    acid.create_table(_mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]), root)
    acid.delete_where(spark, root, "k >= 1")  # delete everything
    snap = acid.read_snapshot(spark, root)
    assert snap.count() == 0
    assert [f.name for f in snap.schema.fields] == ["k", "v", "amt"]
    # prior version still readable (time travel across the delete)
    assert acid.read_snapshot(spark, root, version=0).count() == 2


def test_vacuum_removes_aged_out_and_orphans(spark, root):
    acid.create_table(_mk(spark, [(1, "a", 1.0)]), root)
    acid.create_table(_mk(spark, [(2, "b", 2.0)]), root)  # overwrite: v1
    # plant a crash orphan (data written, never logged)
    orphan_dir = os.path.join(root, "data", "v9-orphan")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-orphan.parquet")
    open(orphan, "wb").write(b"not parquet")
    deleted = acid.vacuum(root, keep_versions=1)
    assert any("orphan" in d for d in deleted)
    v0_files = set(acid._read_log(root)[0]["adds"])
    assert v0_files & set(deleted) == v0_files  # aged-out v0 data gone
    # latest snapshot unharmed
    assert acid.read_snapshot(spark, root).count() == 1
    # v0 data is gone, but the log remembers the history
    assert acid.history(spark, root).count() == 2


def test_history_shape(spark, root):
    acid.create_table(_mk(spark, [(1, "a", 1.0)]), root)
    acid.append(_mk(spark, [(2, "b", 2.0)]), root, app_txn_id="t1")
    h = {r["version"]: r for r in acid.history(spark, root).collect()}
    assert h[0]["op"] == "overwrite" and h[1]["op"] == "append"
    assert h[1]["app_txn_id"] == "t1"
    assert h[1]["n_adds"] >= 1 and h[1]["n_removes"] == 0
