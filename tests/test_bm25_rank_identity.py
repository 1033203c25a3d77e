"""Oracle rank-identity (SURVEY.md §5.2 item 1): engine top-k must match the
NumPy oracle's docids and scores (rtol 1e-6; in practice 1e-12) per query,
with equal-score tie groups compared as sets under (score desc, docid asc)."""

from __future__ import annotations

import math

import pytest

from document_retrieval_spark.config import REFERENCE_PROFILE, BM25Config
from document_retrieval_spark.operators import assemble_documents
from document_retrieval_spark.operators.stats import (
    build_term_stats,
    collection_stats,
    term_frequencies,
    tokenize_documents,
)
from document_retrieval_spark.oracle import oracle_topk
from document_retrieval_spark.query import bm25_score_exhaustive, prepare_query_terms

K = 10


def group_ties(ranked: list[tuple[str, float]], tol=1e-9):
    """Split a ranked (docid, score) list into tie groups."""
    groups, cur, cur_s = [], [], None
    for d, s in ranked:
        if cur and abs(s - cur_s) > tol:
            groups.append((cur_s, set(cur)))
            cur = []
        cur.append(d)
        cur_s = s
    if cur:
        groups.append((cur_s, set(cur)))
    return groups


def assert_rank_identical(got, want, qid):
    """Tie-aware comparison: equal-score prefixes compared as sets."""
    assert len(got) == len(want), qid
    gg, wg = group_ties(got), group_ties(want)
    gi = wi = 0
    gset, wset = set(), set()
    # flatten tie groups greedily: accumulated doc sets must agree at every
    # tie-group boundary; scores must agree pairwise in rank order
    for (gs, gd), (ws, wd) in zip(gg, wg):
        assert math.isclose(gs, ws, rel_tol=1e-6, abs_tol=1e-9), (qid, gs, ws)
    for (g_d, g_s), (w_d, w_s) in zip(got, want):
        assert math.isclose(g_s, w_s, rel_tol=1e-6, abs_tol=1e-9), (qid, g_s, w_s)
    # cumulative set equality at tie boundaries
    def cum_at_boundaries(groups, limit):
        out, acc = [], set()
        for _, ds in groups:
            acc |= ds
            out.append(frozenset(acc))
        return out

    for a, b in zip(cum_at_boundaries(gg, K), cum_at_boundaries(wg, K)):
        # last group may be truncated differently by the k cutoff; only
        # compare boundaries where both sides have the same cumulative size
        if len(a) == len(b):
            assert a == b, qid


@pytest.fixture(scope="module")
def engine_topk(spark, transcripts_df, queries_df):
    bm25 = BM25Config()
    docs = tokenize_documents(assemble_documents(transcripts_df), REFERENCE_PROFILE)
    tf = term_frequencies(docs)
    coll = collection_stats(docs)
    stats = build_term_stats(tf, coll)  # carries df, idf, n_docs, avgdl
    qt = prepare_query_terms(queries_df, REFERENCE_PROFILE, bm25)
    res = bm25_score_exhaustive(qt, tf, stats, docs.select("docid", "dl"), bm25, k=K)
    out: dict[str, list[tuple[str, float]]] = {}
    for r in res.collect():
        out.setdefault(r["query_id"], []).append((r["rank"], r["docid"], r["score"]))
    return {q: [(d, s) for _, d, s in sorted(v)] for q, v in out.items()}


def test_rank_identity_vs_oracle(engine_topk, oracle_index, queries_pdf):
    bm25 = BM25Config()
    n_nonempty = 0
    for _, row in queries_pdf.iterrows():
        want = oracle_topk(oracle_index, row["query"], REFERENCE_PROFILE, bm25, k=K)
        got = engine_topk.get(row["query_id"], [])
        assert_rank_identical(got, want, row["query_id"])
        if want:
            n_nonempty += 1
    assert n_nonempty >= 40  # fixture guarantees most queries hit the corpus


def test_standard_length_norm_variant(spark, transcripts_df, queries_df,
                                      oracle_index, queries_pdf):
    """The textbook Robertson form (variants 2/4) behind the config flag."""
    bm25 = BM25Config(length_norm="standard")
    docs = tokenize_documents(assemble_documents(transcripts_df), REFERENCE_PROFILE)
    tf = term_frequencies(docs)
    stats = build_term_stats(tf, collection_stats(docs))
    qt = prepare_query_terms(queries_df.limit(10), REFERENCE_PROFILE, bm25)
    res = bm25_score_exhaustive(qt, tf, stats, docs.select("docid", "dl"), bm25, k=K)
    got: dict[str, list[tuple[str, float]]] = {}
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["docid"], r["score"]))
    sub = queries_pdf.set_index("query_id").loc[sorted(got)]
    for qid, row in sub.iterrows():
        want = oracle_topk(oracle_index, row["query"], REFERENCE_PROFILE, bm25, k=K)
        assert_rank_identical([(d, s) for _, d, s in sorted(got[qid])], want, qid)
