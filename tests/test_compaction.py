"""Streaming delta -> index compaction (the batch half of the lambda,
streaming/ingest.py module contract): stream N micro-batches of raw turns
into the staging table, IndexBuilder.compact folds them in, and query
results equal a cold batch build over the union corpus."""

from __future__ import annotations

import math
import os

import pytest

from document_retrieval_spark.config import (
    REFERENCE_PROFILE,
    BM25Config,
    EngineConfig,
    IndexConfig,
)
from document_retrieval_spark.fixtures import (
    gen_queries,
    gen_transcripts,
    transcripts_schema,
)
from document_retrieval_spark.index import IndexBuilder, load_index
from document_retrieval_spark.query import prepare_query_terms
from document_retrieval_spark.query.wand import wand_topk
from document_retrieval_spark.streaming.ingest import stage_turns

CFG = EngineConfig(
    tokenizer=REFERENCE_PROFILE,
    bm25=BM25Config(),
    index=IndexConfig(n_shards=8, n_shard_groups=3, salt_df_threshold=10,
                      block_size=16),
)


def _topk(spark, out, queries_df, k=10):
    idx = load_index(spark, out)
    qt = prepare_query_terms(queries_df, CFG.tokenizer, CFG.bm25)
    res = wand_topk(qt, idx.postings, idx.doc_map, idx.coll, CFG.bm25, k=k)
    return {
        (r["query_id"], r["rank"]): (r["docid"], round(r["score"], 9))
        for r in res.collect()
    }


def test_stream_compact_equals_cold_build(spark, tmp_path_factory):
    # base corpus: conversations 0..59; three streamed batches add 60..89
    all_tr = gen_transcripts(90, seed=77)
    convs = sorted(all_tr["conv_id"].unique())
    base = all_tr[all_tr["conv_id"].isin(convs[:60])]
    deltas = [
        all_tr[all_tr["conv_id"].isin(convs[60 + 10 * i:60 + 10 * (i + 1)])]
        for i in range(3)
    ]
    queries = gen_queries(all_tr, 30, seed=78)
    qdf = spark.createDataFrame(queries[["query_id", "query"]])

    out_inc = str(tmp_path_factory.mktemp("idx_inc"))
    out_cold = str(tmp_path_factory.mktemp("idx_cold"))
    src = str(tmp_path_factory.mktemp("turn_src"))
    stage = str(tmp_path_factory.mktemp("stage")) + "/turns"
    ckpt = str(tmp_path_factory.mktemp("ckpt"))

    builder = IndexBuilder(spark, CFG, out_inc)
    builder.build(spark.createDataFrame(base, schema=transcripts_schema()))

    # stream the deltas: drop 3 batch files, run the availableNow file-source
    # query into the staging table after each drop
    schema = transcripts_schema()
    for i, d in enumerate(deltas):
        spark.createDataFrame(d, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = stage_turns(stream, stage, ckpt)
        q.awaitTermination(300)

    staged = spark.read.parquet(stage)
    assert staged.count() == sum(len(d) for d in deltas)

    report = builder.compact(staged)
    assert report["stages"]["docs"]["appended"] == 30
    assert report["total"]["postings_written"] > 0

    # compacting the SAME staging table again is a no-op on docs (anti-join)
    report2 = builder.compact(staged)
    assert report2["stages"]["docs"]["appended"] == 0

    # cold build over the union corpus
    IndexBuilder(spark, CFG, out_cold).build(
        spark.createDataFrame(all_tr, schema=schema)
    )

    got, want = _topk(spark, out_inc, qdf), _topk(spark, out_cold, qdf)
    assert set(got) == set(want)
    mism = {k: (got[k], want[k]) for k in want if got[k][0] != want[k][0]
            or not math.isclose(got[k][1], want[k][1], rel_tol=1e-9)}
    assert not mism, mism

    # stats reflect the union corpus (N = 90 docs)
    idx = load_index(spark, out_inc)
    assert idx.coll.collect()[0]["n_docs"] == 90
    assert idx.doc_map.count() == 90
    # ordinals stay dense + unique after append
    ords = [r["doc_ord"] for r in idx.doc_map.select("doc_ord").collect()]
    assert sorted(ords) == list(range(90))


def test_compact_per_language_index(spark, tmp_path_factory):
    """Compaction composes with IndexConfig.lang_col: streamed conversations
    fold into the per-language models and match a cold per-language build."""
    cfg = EngineConfig(
        tokenizer=REFERENCE_PROFILE,
        bm25=BM25Config(),
        index=IndexConfig(n_shards=8, n_shard_groups=2, salt_df_threshold=10,
                          block_size=16, lang_col="lang"),
    )
    all_tr = gen_transcripts(60, seed=91, multilang=True)
    convs = sorted(all_tr["conv_id"].unique())
    base = all_tr[all_tr["conv_id"].isin(convs[:40])]
    delta = all_tr[all_tr["conv_id"].isin(convs[40:])]
    queries = gen_queries(all_tr, 20, seed=92)

    out_inc = str(tmp_path_factory.mktemp("idx_inc_lang"))
    out_cold = str(tmp_path_factory.mktemp("idx_cold_lang"))
    b = IndexBuilder(spark, cfg, out_inc)
    b.build(spark.createDataFrame(base))
    rep = b.compact(spark.createDataFrame(delta))
    assert rep["stages"]["docs"]["appended"] == 20
    IndexBuilder(spark, cfg, out_cold).build(spark.createDataFrame(all_tr))

    qdf = spark.createDataFrame(queries[["query_id", "query", "lang"]])

    def topk_lang(out):
        idx = load_index(spark, out)
        qt = prepare_query_terms(qdf, cfg.tokenizer, cfg.bm25, lang_col="lang")
        res = wand_topk(qt, idx.postings, idx.doc_map, idx.coll, cfg.bm25,
                        k=10, lang_col="lang")
        return {
            (r["query_id"], r["rank"]): (r["docid"], round(r["score"], 9))
            for r in res.collect()
        }

    got, want = topk_lang(out_inc), topk_lang(out_cold)
    assert got == want and len(got) > 0


def test_compact_crash_recovery(spark, tmp_path_factory, monkeypatch):
    """Write-ahead commit: a crash AFTER the COMMIT marker rolls forward on
    the next run; leftover staging WITHOUT a marker rolls back. Either way
    the final index equals a cold build — no staged conversation is ever
    silently lost to the anti-join."""
    all_tr = gen_transcripts(40, seed=88)
    convs = sorted(all_tr["conv_id"].unique())
    base = all_tr[all_tr["conv_id"].isin(convs[:25])]
    delta = all_tr[all_tr["conv_id"].isin(convs[25:])]
    schema = transcripts_schema()
    out_inc = str(tmp_path_factory.mktemp("idx_crash"))
    out_cold = str(tmp_path_factory.mktemp("idx_crash_cold"))
    builder = IndexBuilder(spark, CFG, out_inc)
    builder.build(spark.createDataFrame(base, schema=schema))

    # leftover staging WITHOUT a marker (crash before the commit point):
    # recovery must discard it and the subsequent compact must still work
    pend = os.path.join(out_inc, "_compact_pending", "docs")
    os.makedirs(pend)
    open(os.path.join(pend, "part-junk.parquet"), "w").write("junk")

    # crash AFTER the commit point: _apply_commit raises once
    orig_apply = IndexBuilder._apply_commit

    def crashing(self, commit):
        raise RuntimeError("injected crash after commit point")

    monkeypatch.setattr(IndexBuilder, "_apply_commit", crashing)
    ddf = spark.createDataFrame(delta, schema=schema)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected crash"):
        builder.compact(ddf)
    monkeypatch.setattr(IndexBuilder, "_apply_commit", orig_apply)
    assert os.path.exists(
        os.path.join(out_inc, "_compact_pending", "COMMIT.json")
    )

    # next compact: recovery rolls the marked commit forward, then the
    # anti-join sees the docs as indexed (appended == 0)
    report = builder.compact(ddf)
    assert report["stages"]["docs"]["appended"] == 0
    assert report["stages"]["docs"]["rows"] == 40
    assert not os.path.exists(os.path.join(out_inc, "_compact_pending"))

    IndexBuilder(spark, CFG, out_cold).build(
        spark.createDataFrame(all_tr, schema=schema)
    )
    qdf = spark.createDataFrame(
        gen_queries(all_tr, 15, seed=89)[["query_id", "query"]]
    )
    assert _topk(spark, out_inc, qdf) == _topk(spark, out_cold, qdf)


def test_reader_survives_compaction_swap(spark, tmp_path_factory):
    """Read-during-compact (r4 brief task 6): a reader that resolved the
    index BEFORE a compaction must finish correctly AFTER the compaction
    swaps stats/postings — the rebuilt family is MVCC-versioned
    (stats/v=N, postings/v=N + CURRENT.json pointer; index/build.py), so
    the reader's version stays on disk through one flip. A fresh
    load_index sees the new version; versions past the retention window
    are reclaimed."""
    import json

    all_tr = gen_transcripts(60, seed=171)
    convs = sorted(all_tr["conv_id"].unique())
    base = all_tr[all_tr["conv_id"].isin(convs[:40])]
    d1 = all_tr[all_tr["conv_id"].isin(convs[40:50])]
    d2 = all_tr[all_tr["conv_id"].isin(convs[50:])]
    queries = gen_queries(base, 15, seed=172)
    qdf = spark.createDataFrame(queries[["query_id", "query"]])

    out = str(tmp_path_factory.mktemp("idx_mvcc"))
    b = IndexBuilder(spark, CFG, out)
    b.build(spark.createDataFrame(base, schema=transcripts_schema()))

    def ptr():
        with open(os.path.join(out, "CURRENT.json")) as f:
            return json.load(f)

    assert ptr() == {"version": 1, "stale": False}

    # reader A resolves the v1 index NOW and runs once
    reader = load_index(spark, out)
    qt = prepare_query_terms(qdf, CFG.tokenizer, CFG.bm25)

    def run(idx):
        res = wand_topk(qt, idx.postings, idx.doc_map, idx.coll, CFG.bm25,
                        k=10)
        return {
            (r["query_id"], r["rank"]): (r["docid"], round(r["score"], 9))
            for r in res.collect()
        }

    before = run(reader)
    assert before

    # compaction swaps the index to v2 while reader A still holds v1
    b.compact(spark.createDataFrame(d1, schema=transcripts_schema()))
    assert ptr() == {"version": 2, "stale": False}
    assert os.path.isdir(os.path.join(out, "postings", "v=1"))  # retained
    assert os.path.isdir(os.path.join(out, "stats", "v=1"))

    # reader A re-executes its HELD DataFrames: same files, same results —
    # the old stats (N, avgdl, idf) and postings are the consistent v1
    # snapshot, and appended doc_map rows can't surface (not in v1
    # postings)
    after_swap = run(reader)
    assert after_swap == before

    # a fresh resolve sees the compacted v2 index: strictly more docs
    fresh = load_index(spark, out)
    assert fresh.coll.first()["n_docs"] > reader.coll.first()["n_docs"]
    got_new = run(fresh)
    assert got_new  # scores reflect the new collection stats

    # second compaction: v3 published, v1 falls out of the retention
    # window and is reclaimed; v2 (the previous version) is retained
    b.compact(spark.createDataFrame(d2, schema=transcripts_schema()))
    assert ptr() == {"version": 3, "stale": False}
    assert not os.path.exists(os.path.join(out, "postings", "v=1"))
    assert os.path.isdir(os.path.join(out, "postings", "v=2"))
    assert not os.path.exists(os.path.join(out, "stats", "v=1"))
