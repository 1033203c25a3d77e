"""Metric harness parity: Spark-side Recall@k / MRR == oracle metrics
(SURVEY.md §5.2 item 7)."""

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
from document_retrieval_spark.oracle import oracle_metrics, oracle_topk
from document_retrieval_spark.query import (
    bm25_score_exhaustive,
    prepare_query_terms,
    recall_mrr,
)


def test_recall_mrr_parity(spark, transcripts_df, queries_df, oracle_index,
                           queries_pdf):
    bm25 = BM25Config()
    docs = tokenize_documents(assemble_documents(transcripts_df), REFERENCE_PROFILE)
    tf = term_frequencies(docs)
    stats = build_term_stats(tf, collection_stats(docs))
    qt = prepare_query_terms(queries_df, REFERENCE_PROFILE, bm25)
    topk = bm25_score_exhaustive(qt, tf, stats, docs.select("docid", "dl"), bm25, k=10)
    got = recall_mrr(topk, queries_df.select("query_id", "positive_docs")).collect()[0]

    retrieved = {q: [] for q in queries_pdf["query_id"]}
    for _, row in queries_pdf.iterrows():
        retrieved[row["query_id"]] = [
            d
            for d, _ in oracle_topk(
                oracle_index, row["query"], REFERENCE_PROFILE, bm25, k=10
            )
        ]
    positives = dict(zip(queries_pdf["query_id"], queries_pdf["positive_docs"]))
    want = oracle_metrics(retrieved, positives)
    for k in (1, 5, 10):
        assert math.isclose(got[f"recall@{k}"], want[f"recall@{k}"], abs_tol=1e-9)
    assert math.isclose(got["mrr@10"], want["mrr@10"], abs_tol=1e-9)
    # sanity: the fixture corpus is retrievable — recall@10 should be high
    assert want["recall@10"] > 0.5


def test_mrr_capped_at_mrr_k(spark):
    """A positive first retrieved at rank 15 contributes 0 to mrr@10 even when
    the caller retrieves k=20 rows (the oracle and SQL twin slice to top-10)."""
    topk = spark.createDataFrame(
        [("q1", r, f"d{r}") for r in range(1, 21)]
        + [("q2", r, f"e{r}") for r in range(1, 21)],
        ["query_id", "rank", "docid"],
    )
    truth = spark.createDataFrame(
        [("q1", "d15"), ("q2", "e3")], ["query_id", "positive_docs"]
    )
    got = recall_mrr(topk, truth, ks=(1, 5, 10)).collect()[0]
    # q1 hit at 15 -> outside mrr@10 window; q2 hit at 3 -> 1/3
    assert abs(got["mrr@10"] - (0.0 + 1.0 / 3.0) / 2.0) < 1e-12
    assert abs(got["recall@10"] - 0.5) < 1e-12  # only q2 within top-10
    got20 = recall_mrr(topk, truth, ks=(1, 5, 10), mrr_k=20).collect()[0]
    assert abs(got20["mrr@20"] - (1.0 / 15.0 + 1.0 / 3.0) / 2.0) < 1e-12
