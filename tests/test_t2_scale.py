"""t2 correctness tier (FIXTURES.md §1): 2,000 conversations (~13k turns),
100 queries — full compressed-index + WAND path vs the NumPy oracle, plus the
multilang per-language partitioning variant (P2/P3)."""

from __future__ import annotations

import math

import pytest

from document_retrieval_spark.config import (
    REFERENCE_PROFILE,
    BM25Config,
    IndexConfig,
)
from document_retrieval_spark.fixtures import (
    gen_queries,
    gen_transcripts,
    transcripts_schema,
)
from document_retrieval_spark.operators import assemble_documents
from document_retrieval_spark.operators.postings import (
    assign_doc_ordinals,
    build_postings,
)
from document_retrieval_spark.operators.stats import (
    build_term_stats,
    collection_stats,
    term_frequencies,
    tokenize_documents,
)
from document_retrieval_spark.oracle import build_oracle_index, oracle_topk
from document_retrieval_spark.query import (
    bm25_score_exhaustive,
    prepare_query_terms,
)
from document_retrieval_spark.query.wand import wand_topk

BM25 = BM25Config()


@pytest.fixture(scope="module")
def t2(spark):
    tr = gen_transcripts(2000, seed=101)
    q = gen_queries(tr, 100, seed=102)
    tdf = spark.createDataFrame(tr, schema=transcripts_schema())
    return tr, q, tdf


def test_t2_wand_rank_identity(spark, t2):
    tr, q, tdf = t2
    docs = tokenize_documents(assemble_documents(tdf), REFERENCE_PROFILE)
    docs_ord = assign_doc_ordinals(docs.select("docid", "dl"))
    docs_ord.persist().count()
    tf = term_frequencies(docs)
    coll = collection_stats(docs)
    stats = build_term_stats(tf, coll)
    postings = build_postings(
        tf.join(docs_ord, "docid"), stats,
        IndexConfig(n_shards=16, salt_df_threshold=100), BM25,
        seg_postings=512,
    )
    qt = prepare_query_terms(spark.createDataFrame(q), REFERENCE_PROFILE, BM25)
    res = wand_topk(qt, postings, docs_ord, coll, BM25, k=10)
    got: dict[str, list] = {}
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["docid"], r["score"]))

    by = tr.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    oracle_docs = list(by.groupby("conv_id", sort=True)["text"].agg(" ".join).items())
    oidx = build_oracle_index(oracle_docs, REFERENCE_PROFILE)
    n = 0
    for _, row in q.iterrows():
        want = oracle_topk(oidx, row["query"], REFERENCE_PROFILE, BM25, k=10)
        g = [(d, s) for _, d, s in sorted(got.get(row["query_id"], []))]
        assert len(g) == len(want), row["query_id"]
        for (gd, gs), (wd, ws) in zip(g, want):
            assert math.isclose(gs, ws, rel_tol=1e-6, abs_tol=1e-9), row["query_id"]
        if want:
            n += 1
    assert n >= 90


def test_t2_multilang_per_language_models(spark):
    """Per-language partitioning (P2/P3): each language is its own model with
    its own N/avgdl/df — engine must match per-language oracles."""
    tr = gen_transcripts(600, seed=201, multilang=True)
    q = gen_queries(tr, 60, seed=202)
    tdf = spark.createDataFrame(tr)

    docs = tokenize_documents(
        assemble_documents(tdf, lang_col="lang"), REFERENCE_PROFILE
    )
    tf = term_frequencies(docs, lang_col="lang")
    coll = collection_stats(docs, lang_col="lang")
    stats = build_term_stats(tf, coll, lang_col="lang")
    qt = prepare_query_terms(
        spark.createDataFrame(q), REFERENCE_PROFILE, BM25, lang_col="lang"
    )
    res = bm25_score_exhaustive(
        qt, tf, stats, docs.select("docid", "dl"), BM25, k=10, lang_col="lang"
    )
    got: dict[str, list] = {}
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["docid"], r["score"]))

    # same queries through the per-language COMPRESSED index + WAND
    docs_ord = assign_doc_ordinals(docs.select("docid", "dl"))
    postings = build_postings(
        tf.join(docs_ord.select("docid", "doc_ord", "dl"), "docid"),
        stats,
        IndexConfig(n_shards=8, salt_df_threshold=50),
        BM25,
        seg_postings=256,
        lang_col="lang",
    )
    wres = wand_topk(qt, postings, docs_ord, coll, BM25, k=10, lang_col="lang")
    wgot: dict[str, list] = {}
    for r in wres.collect():
        wgot.setdefault(r["query_id"], []).append((r["rank"], r["docid"], r["score"]))
    assert set(wgot) == set(got)
    for qid in got:
        for (ga, gb, gs), (wa, wb, ws) in zip(sorted(got[qid]), sorted(wgot[qid])):
            assert gb == wb and math.isclose(gs, ws, rel_tol=1e-9), qid

    # one oracle per language over that language's docs only
    by = tr.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    docs_pdf = by.groupby("conv_id", sort=True).agg(
        text=("text", " ".join), lang=("lang", "first")
    )
    oracles = {
        lang: build_oracle_index(
            list(grp["text"].items()), REFERENCE_PROFILE
        )
        for lang, grp in docs_pdf.groupby("lang")
    }
    n = 0
    for _, row in q.iterrows():
        oidx = oracles[row["lang"]]
        want = oracle_topk(oidx, row["query"], REFERENCE_PROFILE, BM25, k=10)
        g = [(d, s) for _, d, s in sorted(got.get(row["query_id"], []))]
        assert len(g) == len(want), (row["query_id"], row["lang"])
        for (gd, gs), (wd, ws) in zip(g, want):
            assert gd == wd or math.isclose(gs, ws, rel_tol=1e-6), row["query_id"]
            assert math.isclose(gs, ws, rel_tol=1e-6, abs_tol=1e-9), row["query_id"]
        if want:
            n += 1
    assert n >= 50
