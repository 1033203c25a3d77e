"""Skew fixture (FIXTURES.md §6): one token injected into ~60% of all turns
dominates the index; the range-salting path must split it into bounded
segments, merge correctly, and the build metrics must report the skew."""

from __future__ import annotations

import pytest

from document_retrieval_spark.config import (
    REFERENCE_PROFILE,
    BM25Config,
    EngineConfig,
    IndexConfig,
)
from document_retrieval_spark.fixtures import gen_transcripts, transcripts_schema
from document_retrieval_spark.index import IndexBuilder, load_index
from document_retrieval_spark.operators import assemble_documents
from document_retrieval_spark.operators.postings import (
    assign_doc_ordinals,
    build_postings,
    decode_postings_df,
)
from document_retrieval_spark.operators.stats import (
    build_term_stats,
    collection_stats,
    term_frequencies,
    tokenize_documents,
)

HOT = "megahot"


@pytest.fixture(scope="module")
def skewed(spark):
    tr = gen_transcripts(300, seed=77, hot_term=HOT, hot_frac=0.6)
    return tr, spark.createDataFrame(tr, schema=transcripts_schema())


def test_hot_term_salted_into_bounded_segments(spark, skewed):
    tr, tdf = skewed
    docs = tokenize_documents(assemble_documents(tdf), REFERENCE_PROFILE)
    docs_ord = assign_doc_ordinals(docs.select("docid", "dl"))
    tf = term_frequencies(docs)
    stats = build_term_stats(tf, collection_stats(docs))
    seg_cap = 64
    postings = build_postings(
        tf.join(docs_ord, "docid"), stats,
        IndexConfig(n_shards=8, salt_df_threshold=50), BM25Config(),
        seg_postings=seg_cap,
    )
    hot_rows = postings.filter(postings.term == HOT).collect()
    total = sum(r["n_postings"] for r in hot_rows)
    hot_df = tf.filter(tf.term == HOT).count()
    assert total == hot_df and hot_df > 250  # ~60% of turns -> nearly all docs
    assert len(hot_rows) > 1, "hot term must be split into multiple segments"
    assert all(r["n_postings"] <= seg_cap for r in hot_rows)
    # segments disjoint + ordered
    spans = sorted((r["first_ord"], r["last_ord"]) for r in hot_rows)
    for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
        assert b1 < a2
    # merged content correct: decode == tf rows for the hot term
    decoded = {
        r["doc_ord"]: r["tf"]
        for r in decode_postings_df(
            postings.filter(postings.term == HOT)
        ).collect()
    }
    want = {
        r["doc_ord"]: r["tf"]
        for r in tf.join(docs_ord, "docid").filter(tf.term == HOT).collect()
    }
    assert decoded == want


def test_skew_ratio_reported_in_manifest(spark, skewed, tmp_path_factory):
    _, tdf = skewed
    out = str(tmp_path_factory.mktemp("idx_skew"))
    cfg = EngineConfig(
        tokenizer=REFERENCE_PROFILE,
        bm25=BM25Config(),
        index=IndexConfig(n_shards=8, n_shard_groups=2, salt_df_threshold=50),
    )
    report = IndexBuilder(spark, cfg, out).build(tdf)
    assert report["total"]["skew_ratio"] > 10  # hot fixture >> median-df terms
    idx = load_index(spark, out)
    assert idx.postings.filter(idx.postings.term == HOT).count() >= 1
