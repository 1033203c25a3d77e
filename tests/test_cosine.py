"""Cosine top-k parity with the V1-V3 oracle path (SURVEY.md §5.2 item 5)."""

from __future__ import annotations

import math

from document_retrieval_spark.config import REFERENCE_PROFILE, BM25Config
from document_retrieval_spark.operators import assemble_documents
from document_retrieval_spark.operators.stats import (
    build_term_stats,
    collection_stats,
    term_frequencies,
    tokenize_documents,
)
from document_retrieval_spark.oracle import oracle_cosine_topk
from document_retrieval_spark.query import cosine_topk, prepare_query_terms


def test_cosine_rank_identity(spark, transcripts_df, queries_df, oracle_index,
                              queries_pdf):
    docs = tokenize_documents(assemble_documents(transcripts_df), REFERENCE_PROFILE)
    tf = term_frequencies(docs)
    stats = build_term_stats(tf, collection_stats(docs))
    qt = prepare_query_terms(
        queries_df, REFERENCE_PROFILE, BM25Config(unique_query_terms=True)
    )
    res = cosine_topk(qt, tf, stats, k=10)
    got: dict[str, list[tuple[str, float]]] = {}
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["docid"], r["score"]))
    n = 0
    for _, row in queries_pdf.iterrows():
        want = oracle_cosine_topk(oracle_index, row["query"], REFERENCE_PROFILE, k=10)
        g = [(d, s) for _, d, s in sorted(got.get(row["query_id"], []))]
        assert len(g) == len(want), row["query_id"]
        for (gd, gs), (wd, ws) in zip(g, want):
            assert math.isclose(gs, ws, rel_tol=1e-6, abs_tol=1e-9), row["query_id"]
        assert {d for d, _ in g} == {d for d, _ in want}, row["query_id"]
        if want:
            n += 1
    assert n >= 40


def test_cosine_precomputed_norms_identical(spark, transcripts_df, queries_df):
    """cosine_topk with index-time doc_norms() equals the self-computing
    path exactly — precomputation is a plan change, not a semantic one."""
    from document_retrieval_spark.query.cosine import doc_norms

    docs = tokenize_documents(assemble_documents(transcripts_df), REFERENCE_PROFILE)
    tf = term_frequencies(docs)
    stats = build_term_stats(tf, collection_stats(docs))
    qt = prepare_query_terms(
        queries_df, REFERENCE_PROFILE, BM25Config(unique_query_terms=True)
    )
    base = {(r["query_id"], r["rank"], r["docid"], round(r["score"], 9))
            for r in cosine_topk(qt, tf, stats, k=10).collect()}
    dn = doc_norms(tf, stats)
    pre = {(r["query_id"], r["rank"], r["docid"], round(r["score"], 9))
           for r in cosine_topk(qt, tf, stats, k=10, doc_norm=dn).collect()}
    assert base == pre and len(base) > 0
