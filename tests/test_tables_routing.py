"""read_transcripts source routing (S1, r4 brief task 4): snapshot-dir vs
catalog-table-name vs parquet/json path precedence, INCLUDING the
`spark.read.table` catalog branch — exercised against the session catalog
(a temp view resolves through the same spark.read.table API an Iceberg
catalog table does; no Iceberg jars ship in this sandbox, so the
capability probe is monkeypatched on for the branch test)."""

from __future__ import annotations

import pytest

import document_retrieval_spark.sources.tables as tables_mod
from document_retrieval_spark.sources.snapshots import SnapshotTable
from document_retrieval_spark.sources.tables import (
    _iceberg_available,
    read_transcripts,
)


def _schema_df(spark, transcripts_pdf):
    from document_retrieval_spark.fixtures import transcripts_schema

    return spark.createDataFrame(transcripts_pdf, schema=transcripts_schema())


def test_catalog_probe_is_off_without_catalog_conf(spark):
    # this sandbox configures no spark.sql.catalog.* — the probe must say
    # so (bare names then fall through to the parquet reader)
    assert _iceberg_available(spark) is False


def test_table_name_routes_to_catalog_reader(spark, transcripts_pdf,
                                             monkeypatch):
    """Bare `db.tbl`-style names go through spark.read.table when a
    catalog is configured. A global temp view resolves through the same
    read.table API, which exercises the branch end-to-end."""
    df = _schema_df(spark, transcripts_pdf)
    df.createOrReplaceGlobalTempView("transcripts_route")
    monkeypatch.setattr(tables_mod, "_iceberg_available", lambda s: True)
    got = read_transcripts(spark, "global_temp.transcripts_route")
    assert got.count() == df.count()
    assert set(got.columns) >= {"conv_id", "turn_idx", "role", "text",
                                "tool", "ts"}


def test_catalog_branch_schema_violation_raises(spark, monkeypatch):
    spark.range(3).selectExpr("id as conv_id").createOrReplaceGlobalTempView(
        "bad_transcripts"
    )
    monkeypatch.setattr(tables_mod, "_iceberg_available", lambda s: True)
    with pytest.raises(ValueError, match="missing columns"):
        read_transcripts(spark, "global_temp.bad_transcripts")


def test_path_never_routes_to_catalog(spark, transcripts_pdf, tmp_path,
                                      monkeypatch):
    """An absolute path must use the parquet reader even when a catalog is
    configured — read.table would treat it as a (bogus) table name."""
    df = _schema_df(spark, transcripts_pdf)
    p = str(tmp_path / "tr_parquet")
    df.write.mode("overwrite").parquet(p)

    def boom(s):  # catalog probe must not even be consulted for paths
        raise AssertionError("catalog probe consulted for a path")

    monkeypatch.setattr(tables_mod, "_iceberg_available", boom)
    got = read_transcripts(spark, p)
    assert got.count() == df.count()


def test_snapshot_dir_beats_catalog_heuristic(spark, transcripts_pdf,
                                              tmp_path, monkeypatch):
    """A snapshot table dir wins over every other route (checked first)."""
    df = _schema_df(spark, transcripts_pdf)
    snap_dir = str(tmp_path / "snap_tbl")
    tbl = SnapshotTable(spark, snap_dir)
    tbl.commit_append(df)
    calls = []
    monkeypatch.setattr(
        tables_mod, "_iceberg_available",
        lambda s: calls.append(1) or True,
    )
    got = read_transcripts(spark, snap_dir)
    assert got.count() == df.count()
    assert not calls  # short-circuited before the catalog heuristic


def test_json_path_route(spark, transcripts_pdf, tmp_path):
    import json

    p = tmp_path / "corpus.json"
    rows = transcripts_pdf.head(20).to_dict("records")
    with open(p, "w") as f:
        for r in rows:
            r = dict(r)
            r["ts"] = str(r["ts"])
            f.write(json.dumps(r) + "\n")
    got = read_transcripts(spark, str(p))
    assert got.count() == 20
