"""spark-submit surface end-to-end (north rule: "submitted via spark-submit
--py-files"): scripts/build_index.py -> scripts/query.py in fresh
subprocesses, including the new `--scorer auto` default resolution."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, **kw):
    return subprocess.run(
        [sys.executable, *args], capture_output=True, text=True, cwd=ROOT,
        timeout=420, **kw,
    )


@pytest.fixture(scope="module")
def built_index(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "idx")
    r = _run(["scripts/build_index.py", "--synthesize", "400", "--out", out,
              "--shards", "8", "--groups", "2", "--master", "local[4]"])
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout[r.stdout.index("{"):])
    assert report["total"]["postings_written"] > 0
    return out


def test_build_then_query_auto(built_index, tmp_path):
    qp = str(tmp_path / "queries.parquet")
    pd.DataFrame(
        {"query_id": ["q1", "q2"], "query": ["spark000 index001", "query002 merge005"]}
    ).to_parquet(qp, index=False)
    outp = str(tmp_path / "res.parquet")
    r = _run(["scripts/query.py", "--index", built_index, "--queries", qp,
              "--out", outp, "--k", "5", "--master", "local[4]"])
    assert r.returncode == 0, r.stderr[-2000:]
    # 400-conversation corpus is far below the docpart crossover -> wand
    assert "--scorer auto -> wand" in r.stdout
    res = pd.read_parquet(outp)
    assert set(res.columns) == {"query_id", "rank", "docid", "score"}
    assert len(res) > 0 and res["rank"].min() == 1


def test_query_explicit_docpart(built_index, tmp_path):
    qp = str(tmp_path / "queries.parquet")
    pd.DataFrame({"query_id": ["q1"], "query": ["spark000 token004"]}).to_parquet(
        qp, index=False
    )
    outp = str(tmp_path / "res_dp.parquet")
    outw = str(tmp_path / "res_w.parquet")
    for scorer, out in (("docpart", outp), ("wand", outw)):
        r = _run(["scripts/query.py", "--index", built_index, "--queries", qp,
                  "--out", out, "--k", "5", "--scorer", scorer,
                  "--master", "local[4]"])
        assert r.returncode == 0, (scorer, r.stderr[-2000:])
    a = pd.read_parquet(outp).sort_values("rank").reset_index(drop=True)
    b = pd.read_parquet(outw).sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # layouts are rank/score-identical
