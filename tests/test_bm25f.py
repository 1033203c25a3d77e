"""Conjunctive (boolean-AND) BM25 and simple-BM25F fielded scoring.

Both are standard fulltext-engine extensions the reference lacks (its
scorer is disjunctive, single-field — `bm25_ranking.ipynb cell 3:31-39`):

- conjunctive: every query term must occur in the doc (Lucene BooleanQuery
  MUST). Tested as a pure SEMANTIC delta on the already-differentially-
  tested disjunctive scorer: result set == {(q,d): all terms present}
  computed in pure Python, scores bit-equal to the disjunctive scores.
- simple BM25F (Robertson, Zaragoza & Taylor, CIKM'04): per-field weighted
  tf with per-field length normalization, saturated ONCE on the combined
  tf~. Tested against a literal pure-Python twin, on (a) a synthetic
  title/body split and (b) the transcript-native role fields
  (user/assistant/tool) — the shape a transcript search engine actually
  wants (up-weight what the user said).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

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
from document_retrieval_spark.query.bm25 import bm25f_score, bm25f_tf_tilde

K1, B = 1.5, 0.75
TITLE_LEN = 8
FIELDS_TB = {"title": (2.0, 0.75), "body": (1.0, 0.75)}
FIELDS_ROLE = {"user": (2.0, 0.75), "assistant": (1.0, 0.75), "tool": (0.5, 0.5)}


def _doc_tokens(transcripts_pdf) -> dict[str, list[str]]:
    by = transcripts_pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    return {
        d: oracle_tokenize(t, REFERENCE_PROFILE)
        for d, t in by.groupby("conv_id", sort=True)["text"].agg(" ".join).items()
    }


def _bm25f_twin(field_docs, fields, query_tokens):
    """Literal simple-BM25F: field_docs = {docid: {field: [tokens]}}."""
    n = len(field_docs)
    avgdl = {
        f: sum(len(fd.get(f, [])) for fd in field_docs.values()) / n
        for f in fields
    }
    df: dict[str, int] = {}
    for fd in field_docs.values():
        for t in {t for toks in fd.values() for t in toks}:
            df[t] = df.get(t, 0) + 1
    idf = {t: math.log1p((n - v + 0.5) / (v + 0.5)) for t, v in df.items()}
    out = {}
    for d, fd in field_docs.items():
        s = 0.0
        for t in dict.fromkeys(query_tokens):  # distinct, stable order
            tft = 0.0
            for f, (w, b) in fields.items():
                toks = fd.get(f, [])
                tf = toks.count(t)
                if tf:
                    tft += w * tf / (1 - b + b * len(toks) / avgdl[f])
            if tft > 0.0 and t in idf:
                s += idf[t] * tft * (K1 + 1) / (K1 + tft)
        if s != 0.0:
            out[d] = s
    return out


@pytest.fixture(scope="module")
def built(spark, transcripts_pdf):
    tdf = spark.createDataFrame(transcripts_pdf)
    docs = tokenize_documents(assemble_documents(tdf), REFERENCE_PROFILE)
    tf = term_frequencies(docs)
    stats = build_term_stats(tf, collection_stats(docs))
    return docs, tf, stats


def test_conjunctive_filters_to_all_terms_present(
    spark, transcripts_pdf, queries_pdf, built
):
    docs, tf, stats = built
    bm25 = BM25Config()
    qdf = spark.createDataFrame(queries_pdf[["query_id", "query"]].head(15))
    qt = prepare_query_terms(qdf, REFERENCE_PROFILE, bm25)
    base = bm25_score_exhaustive(
        qt, tf, stats, docs.select("docid", "dl"), bm25, k=10**6
    )
    conj = bm25_score_exhaustive(
        qt, tf, stats, docs.select("docid", "dl"), bm25, k=10**6,
        conjunctive=True,
    )
    base_scores = {
        (r["query_id"], r["docid"]): r["score"] for r in base.collect()
    }
    got = {(r["query_id"], r["docid"]): r["score"] for r in conj.collect()}

    doc_sets = {d: set(toks) for d, toks in _doc_tokens(transcripts_pdf).items()}
    want_keys = set()
    for _, row in queries_pdf.head(15).iterrows():
        q_tokens = set(oracle_tokenize(row["query"], REFERENCE_PROFILE))
        for d, toks in doc_sets.items():
            if q_tokens and q_tokens <= toks:
                want_keys.add((row["query_id"], d))
    assert set(got) == want_keys
    for key, score in got.items():
        assert score == base_scores[key], key  # same doubles, just filtered


def test_conjunctive_oov_term_empties_the_query(spark, built):
    docs, tf, stats = built
    bm25 = BM25Config()
    qdf = spark.createDataFrame(
        [("qoov", "the zzzneverseenterm")], ["query_id", "query"]
    )
    qt = prepare_query_terms(qdf, REFERENCE_PROFILE, bm25)
    res = bm25_score_exhaustive(
        qt, tf, stats, docs.select("docid", "dl"), bm25, k=10,
        conjunctive=True,
    )
    assert res.count() == 0


def _field_tf_from(fields_df):
    """fields_df(docid, field, ftoks) -> (docid, field, term, tf, fdl)."""
    return (
        fields_df.select(
            "docid", "field", F.size("ftoks").alias("fdl"),
            F.explode("ftoks").alias("term"),
        )
        .groupBy("docid", "field", "term")
        .agg(F.any_value("fdl").alias("fdl"), F.count("*").alias("tf"))
    )


def _run_bm25f(spark, fields_df, stats, fields, queries_pdf, n_queries=15):
    n_docs = fields_df.select("docid").distinct().count()
    sums = {
        r["field"]: r["s"]
        for r in fields_df.groupBy("field")
        .agg(F.sum(F.size("ftoks")).alias("s"))
        .collect()
    }
    avgdl = {f: sums.get(f, 0) / n_docs for f in fields}
    tft = bm25f_tf_tilde(_field_tf_from(fields_df), fields, avgdl)
    bm25 = BM25Config()
    qdf = spark.createDataFrame(
        queries_pdf[["query_id", "query"]].head(n_queries)
    )
    qt = prepare_query_terms(qdf, REFERENCE_PROFILE, bm25)
    res = bm25f_score(qt, tft, stats, bm25, k=10**6)
    got: dict[str, dict[str, float]] = {}
    for r in res.collect():
        got.setdefault(r["query_id"], {})[r["docid"]] = r["score"]
    return got


def test_bm25f_title_body_matches_twin(spark, transcripts_pdf, queries_pdf, built):
    docs, _tf, stats = built
    fields_df = docs.select(
        "docid", F.lit("title").alias("field"),
        F.slice("tokens", 1, TITLE_LEN).alias("ftoks"),
    ).unionByName(
        docs.select(
            "docid", F.lit("body").alias("field"),
            F.expr(
                f"slice(tokens, {TITLE_LEN + 1},"
                f" greatest(size(tokens) - {TITLE_LEN}, 0))"
            ).alias("ftoks"),
        )
    )
    got = _run_bm25f(spark, fields_df, stats, FIELDS_TB, queries_pdf)

    toks = _doc_tokens(transcripts_pdf)
    field_docs = {
        d: {"title": t[:TITLE_LEN], "body": t[TITLE_LEN:]}
        for d, t in toks.items()
    }
    for _, row in queries_pdf.head(15).iterrows():
        want = _bm25f_twin(
            field_docs, FIELDS_TB,
            oracle_tokenize(row["query"], REFERENCE_PROFILE),
        )
        g = got.get(row["query_id"], {})
        assert set(g) == set(want), row["query_id"]
        for d, s in want.items():
            assert math.isclose(g[d], s, rel_tol=1e-9, abs_tol=1e-12), (d, s)


def test_bm25f_role_fields_matches_twin(spark, transcripts_pdf, queries_pdf, built):
    """Transcript-native BM25F: the conversation is the doc, the role is the
    field — what the user said is worth 2x what the assistant said and 4x
    the tool output. idf stays doc-level (union of fields), shared with the
    plain BM25 stats table."""
    docs, _tf, stats = built
    tdf = spark.createDataFrame(transcripts_pdf)
    turns = tokenize_documents(
        tdf.select(F.col("conv_id").alias("docid"), "role", "text"),
        REFERENCE_PROFILE,
    )
    fields_df = (
        turns.select("docid", F.col("role").alias("field"), "tokens")
        .groupBy("docid", "field")
        .agg(F.flatten(F.collect_list("tokens")).alias("ftoks"))
    )
    # every (doc, field) pair must exist for avgdl (missing role -> length
    # 0): complete the grid before measuring lengths
    grid = (
        fields_df.select("docid").distinct()
        .crossJoin(spark.createDataFrame(
            [(f,) for f in FIELDS_ROLE], ["field"]
        ))
    )
    fields_df = (
        grid.join(fields_df, ["docid", "field"], "left")
        .withColumn(
            "ftoks",
            F.coalesce("ftoks", F.expr("cast(array() as array<string>)")),
        )
    )
    got = _run_bm25f(spark, fields_df, stats, FIELDS_ROLE, queries_pdf)

    by = transcripts_pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    field_docs: dict[str, dict[str, list[str]]] = {}
    for (conv, role), grp in by.groupby(["conv_id", "role"], sort=True):
        field_docs.setdefault(conv, {})[role] = oracle_tokenize(
            " ".join(grp["text"]), REFERENCE_PROFILE
        )
    for _, row in queries_pdf.head(15).iterrows():
        want = _bm25f_twin(
            field_docs, FIELDS_ROLE,
            oracle_tokenize(row["query"], REFERENCE_PROFILE),
        )
        g = got.get(row["query_id"], {})
        assert set(g) == set(want), row["query_id"]
        for d, s in want.items():
            assert math.isclose(g[d], s, rel_tol=1e-9, abs_tol=1e-12), (d, s)
