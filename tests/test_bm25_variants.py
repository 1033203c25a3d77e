"""BM25 variants 3/5 (SURVEY §2.9) through the ENGINE path
(build_term_stats(idf_plus_one=False) + bm25_score_exhaustive with
dl_mode / duplicate query terms) vs a literal pandas transcription of the
reference loops (`cosine_similarity_bm25_reranking.py:176-195`,
`text_preprocessing_and_stopwords_setup.py:170-188`)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from document_retrieval_spark.config import REFERENCE_PROFILE, BM25Config
from document_retrieval_spark.operators import assemble_documents
from document_retrieval_spark.operators.stats import (
    build_term_stats,
    collection_stats,
    term_frequencies,
    tokenize_documents,
)
from document_retrieval_spark.oracle import oracle_tokenize
from document_retrieval_spark.query import bm25_score_exhaustive, prepare_query_terms

K1, B = 1.5, 0.75


def _reference_scores(docs_text, query_tokens, dl_mode):
    """Literal transcription of the reference's variant-3/5 loops."""
    tf = {d: {} for d in docs_text}
    for d, text in docs_text.items():
        for t in oracle_tokenize(text, REFERENCE_PROFILE):
            tf[d][t] = tf[d].get(t, 0) + 1
    n = len(docs_text)
    df = {}
    for d in tf:
        for t in tf[d]:
            df[t] = df.get(t, 0) + 1
    idf = {t: np.log((n - v + 0.5) / (v + 0.5)) for t, v in df.items()}
    avgdl = sum(sum(v.values()) for v in tf.values()) / n
    out = {}
    for d in tf:
        if dl_mode == "query_terms":
            dl = sum(tf[d].get(t, 0) for t in query_tokens)
        else:
            dl = sum(tf[d].values())
        s = 0.0
        for t in query_tokens:  # duplicates scored per occurrence
            if t in tf[d]:
                s += (
                    idf.get(t, 0.0)
                    * tf[d][t]
                    * (K1 + 1)
                    / (tf[d][t] + K1 * (1 - B + B * dl / avgdl))
                )
        if s != 0.0:
            out[d] = s
    return out


@pytest.mark.parametrize("dl_mode", ["query_terms", "full"],
                         ids=["v3_query_dl", "v5_full_dl"])
def test_variant_engine_matches_reference_loops(spark, transcripts_pdf,
                                                queries_pdf, dl_mode):
    bm25 = BM25Config(length_norm="standard", idf_plus_one=False,
                      unique_query_terms=False, dl_mode=dl_mode)
    by = transcripts_pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    docs_text = dict(by.groupby("conv_id", sort=True)["text"].agg(" ".join))

    tdf = spark.createDataFrame(transcripts_pdf)
    docs = tokenize_documents(assemble_documents(tdf), REFERENCE_PROFILE)
    tf = term_frequencies(docs)
    stats = build_term_stats(tf, collection_stats(docs), idf_plus_one=False)
    qdf = spark.createDataFrame(queries_pdf[["query_id", "query"]].head(15))
    qt = prepare_query_terms(qdf, REFERENCE_PROFILE, bm25)
    res = bm25_score_exhaustive(
        qt, tf, stats, docs.select("docid", "dl"), bm25, k=10**6
    )
    got: dict[str, dict[str, float]] = {}
    for r in res.collect():
        got.setdefault(r["query_id"], {})[r["docid"]] = r["score"]

    checked = 0
    for _, row in queries_pdf.head(15).iterrows():
        q_tokens = oracle_tokenize(row["query"], REFERENCE_PROFILE)
        want = _reference_scores(docs_text, q_tokens, dl_mode)
        g = got.get(row["query_id"], {})
        assert set(g) == set(want), row["query_id"]
        for d, s in want.items():
            assert math.isclose(g[d], s, rel_tol=1e-9, abs_tol=1e-12), (d, s)
        checked += 1
    assert checked == 15
