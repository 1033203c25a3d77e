"""Iceberg-style snapshot layer (sources/snapshots.py): atomic appends,
snapshot isolation, time travel — and the transcripts reader + IndexBuilder
consuming a snapshot table end-to-end."""

from __future__ import annotations

import pytest

from document_retrieval_spark.fixtures import gen_transcripts, transcripts_schema
from document_retrieval_spark.sources import (
    SnapshotTable,
    is_snapshot_table,
    read_transcripts,
)


@pytest.fixture()
def table(spark, tmp_path_factory):
    return SnapshotTable(spark, str(tmp_path_factory.mktemp("snap_tbl")))


def test_commit_read_time_travel(spark, table):
    tr = gen_transcripts(30, seed=11)
    convs = sorted(tr["conv_id"].unique())
    a = tr[tr["conv_id"].isin(convs[:20])]
    b = tr[tr["conv_id"].isin(convs[20:])]
    schema = transcripts_schema()

    assert table.current_snapshot_id() is None
    s1 = table.commit_append(spark.createDataFrame(a, schema=schema))
    s2 = table.commit_append(spark.createDataFrame(b, schema=schema))
    assert (s1, s2) == (1, 2)
    assert table.current_snapshot_id() == 2

    # current = union; time travel to s1 = first batch only
    assert table.read().count() == len(tr)
    assert table.read(snapshot_id=s1).count() == len(a)
    # lineage + summaries
    snaps = table.snapshots()
    assert [s["id"] for s in snaps] == [1, 2]
    assert snaps[1]["parent"] == 1
    assert snaps[1]["summary"]["total_files"] > snaps[1]["summary"]["added_files"] or (
        snaps[0]["summary"]["added_files"] > 0
    )


def test_snapshot_isolation(spark, table):
    tr = gen_transcripts(20, seed=12)
    schema = transcripts_schema()
    table.commit_append(spark.createDataFrame(tr, schema=schema))
    pinned = table.read()  # resolves snapshot 1's file list NOW
    n1 = pinned.count()
    table.commit_append(spark.createDataFrame(tr.assign(conv_id=tr.conv_id + "_b"),
                                              schema=schema))
    # the in-flight reader still sees snapshot 1; a fresh reader sees both
    assert pinned.count() == n1
    assert table.read().count() == 2 * n1


def test_reader_and_builder_consume_snapshot_table(spark, table,
                                                   tmp_path_factory):
    from document_retrieval_spark.config import EngineConfig, IndexConfig
    from document_retrieval_spark.index import IndexBuilder

    tr = gen_transcripts(25, seed=13)
    table.commit_append(spark.createDataFrame(tr, schema=transcripts_schema()))
    assert is_snapshot_table(table.path)
    df = read_transcripts(spark, table.path)
    assert df.count() == len(tr)

    cfg = EngineConfig(index=IndexConfig(n_shards=4, n_shard_groups=2,
                                         salt_df_threshold=10))
    out = str(tmp_path_factory.mktemp("snap_idx"))
    report = IndexBuilder(spark, cfg, out).build(df)
    assert report["total"]["postings_written"] > 0

def test_orphan_snapshot_recovery(spark, table):
    """Crash between snapshot-file create and the VERSION swap leaves an
    orphan snap-<id>.json; the next commit must reclaim it instead of
    colliding on the same id forever (ADVICE r2, single-writer contract)."""
    import json
    import os

    tr = gen_transcripts(10, seed=14)
    schema = transcripts_schema()
    table.commit_append(spark.createDataFrame(tr, schema=schema))
    n1 = table.read().count()

    # simulate the crash window: snap-2.json exists, VERSION still says 1
    orphan = os.path.join(table.path, "snapshots", "snap-2.json")
    with open(orphan, "x") as f:
        json.dump({"id": 2, "parent": 1, "ts": 0.0,
                   "files": ["data/bogus-crashed.parquet"],
                   "summary": {"added_files": 1, "total_files": 2}}, f)
    assert table.current_snapshot_id() == 1

    # a YOUNG orphan is ambiguous (could be a live committer mid-window):
    # the commit refuses rather than silently erasing it
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="not committed"):
        table.commit_append(spark.createDataFrame(tr, schema=schema))

    # age the orphan past the grace window -> reclaimable crash debris
    old_t = 0
    os.utime(orphan, (old_t, old_t))

    # commit succeeds, takes id 2, and the orphan's file list is discarded
    s2 = table.commit_append(
        spark.createDataFrame(tr.assign(conv_id=tr.conv_id + "_c"), schema=schema)
    )
    assert s2 == 2 and table.current_snapshot_id() == 2
    assert table.read().count() == 2 * n1
    assert "data/bogus-crashed.parquet" not in table.snapshot(2)["files"]


def test_orphan_reclaim_never_unlinks_a_committed_snapshot(spark, table,
                                                           monkeypatch):
    """ADVICE r3 TOCTOU: a writer that passed the exists/age check must not
    delete a snap-<id>.json that a concurrent writer created AND committed
    in the window. The reclaim renames aside and re-reads VERSION: if it
    reached new_id, the file is restored and the commit loses loudly."""
    import json
    import os

    tr = gen_transcripts(10, seed=15)
    schema = transcripts_schema()
    table.commit_append(spark.createDataFrame(tr, schema=schema))

    # an AGED snap-2.json that (from this writer's view) looks like crash
    # debris, but whose writer will "commit" VERSION=2 between our age
    # check and the reclaim — simulated by making the VERSION re-read
    # (second call and later) observe the concurrent commit
    orphan = os.path.join(table.path, "snapshots", "snap-2.json")
    committed_files = ["data/committed-by-other-writer.parquet"]
    with open(orphan, "x") as f:
        json.dump({"id": 2, "parent": 1, "ts": 0.0, "files": committed_files,
                   "summary": {"added_files": 1, "total_files": 1}}, f)
    os.utime(orphan, (0, 0))

    real = type(table).current_snapshot_id
    calls = {"n": 0}

    def racing(self):
        calls["n"] += 1
        if calls["n"] >= 3:  # the re-read after rename-aside
            return 2
        return real(self)

    monkeypatch.setattr(type(table), "current_snapshot_id", racing)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="committed by a concurrent"):
        table.commit_append(spark.createDataFrame(tr, schema=schema))
    monkeypatch.undo()

    # the concurrently-committed snapshot file survived, content intact
    with open(orphan) as f:
        assert json.load(f)["files"] == committed_files


def test_orphan_reclaim_leaves_tombstone(spark, table):
    """Reclaimed orphans are renamed aside (snap-<id>.json.orphan-*), never
    unlinked, so even the residual out-of-contract window is recoverable."""
    import json
    import os

    tr = gen_transcripts(10, seed=16)
    schema = transcripts_schema()
    table.commit_append(spark.createDataFrame(tr, schema=schema))
    orphan = os.path.join(table.path, "snapshots", "snap-2.json")
    with open(orphan, "x") as f:
        json.dump({"id": 2, "parent": 1, "ts": 0.0,
                   "files": ["data/crashed.parquet"],
                   "summary": {"added_files": 1, "total_files": 1}}, f)
    os.utime(orphan, (0, 0))
    assert table.commit_append(spark.createDataFrame(tr, schema=schema)) == 2
    snaps = os.listdir(os.path.join(table.path, "snapshots"))
    tombs = [n for n in snaps if n.startswith("snap-2.json.orphan-")]
    assert len(tombs) == 1
    # readers never resolve the tombstone: snapshot 2 is the new commit
    assert "data/crashed.parquet" not in table.snapshot(2)["files"]
