"""Two-stage retrieval: TF-IDF cosine candidate generation -> BM25 rerank.

The reference's system #2 (Kaggle 0.68688, `README.md:10-12`): top-200 cosine
candidates re-scored with BM25 and cut to top-10
(`cosine_similarity_bm25_reranking.py:229-236`; class-based variant
`text_preprocessing_with_stopwords_and_stemming.py:230-236` — SURVEY §2.5 J8,
§2.6 T5).

Spark shape: the candidate set is a (query_id, docid) keyed DataFrame, so the
rerank is a semi-join that prunes the BM25 scoring join to candidate pairs —
at scale this is the point of the cascade: stage 1 cheap over everything,
stage 2 expensive over ~200 rows/query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import BM25Config
from ..operators.topk import topk_per_group
from .bm25 import bm25_term_score
from .cosine import cosine_topk


def cosine_then_bm25(
    query_terms: DataFrame,   # (query_id, term) distinct
    tf: DataFrame,            # (docid, term, tf, dl) — dl carried
    term_stats: DataFrame,    # (term, df, idf, n_docs, avgdl)
    bm25: BM25Config,
    n_candidates: int = 200,
    k: int = 10,
) -> DataFrame:
    """-> (query_id, rank, docid, score): BM25-ranked top-k of the cosine
    top-n_candidates."""
    candidates = cosine_topk(
        query_terms, tf.select("docid", "term", "tf"), term_stats, k=n_candidates
    ).select("query_id", "docid")
    scored = (
        tf.join(F.broadcast(query_terms), "term")
        .join(F.broadcast(term_stats.select("term", "idf", "avgdl")), "term")
        .join(F.broadcast(candidates), ["query_id", "docid"], "leftsemi")
        .withColumn("term_score", bm25_term_score(bm25))
        .groupBy("query_id", "docid")
        .agg(F.sum("term_score").alias("score"))
    )
    return topk_per_group(scored, ["query_id"], "score", "docid", k).select(
        "query_id", "rank", "docid", "score"
    )
