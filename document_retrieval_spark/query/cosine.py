"""TF-IDF cosine retrieval as a sparse dot-product-as-join (SURVEY.md §2.8 V1-V3).

Reference semantics (`cosine_similarity_bm25_reranking.py`):
- doc weight  = tf * idf                       (:94-101)
- query weight = idf, binary tf (repeated query terms overwrite -> idf once)
                                               (:121-126)
- both sides L2-normalized, similarity = dot   (:210-226)

The scipy sparse matmul becomes: join doc weights to query weights on term,
sum products per (query, doc), divide by the two norms. Doc norms are a
per-doc aggregate computed once (reusable across query batches) — the exact
analog of the reference normalizing the matrix once up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.topk import topk_per_group


def doc_norms(
    tf: DataFrame,            # (docid, term, tf)
    term_stats: DataFrame,    # (term, idf)
    lang_col: str | None = None,
) -> DataFrame:
    """(docid, doc_norm): L2 norm of each doc's tf*idf vector.

    Query-INDEPENDENT — the exact analog of the reference normalizing its
    sparse matrix once up front (`cosine_similarity_bm25_reranking.py:210`).
    Compute once per index (persist or write next to stats) and pass to
    `cosine_topk`; recomputing per query batch re-scans the whole tf table
    for a value that only changes when the index does."""
    join_keys = ["term"] + ([lang_col] if lang_col else [])
    doc_w = tf.join(term_stats.select(*join_keys, "idf"), join_keys).withColumn(
        "w", F.col("tf").cast("double") * F.col("idf")
    )
    return doc_w.groupBy("docid").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("doc_norm")
    )


def cosine_topk(
    query_terms: DataFrame,   # (query_id, term) DISTINCT terms
    tf: DataFrame,            # (docid, term, tf)
    term_stats: DataFrame,    # (term, idf)
    k: int = 10,
    lang_col: str | None = None,
    doc_norm: DataFrame | None = None,  # precomputed doc_norms() output
) -> DataFrame:
    join_keys = ["term"] + ([lang_col] if lang_col else [])
    if doc_norm is None:
        doc_norm = doc_norms(tf, term_stats, lang_col=lang_col)
    q_w = (
        query_terms.join(F.broadcast(term_stats.select(*join_keys, "idf")), join_keys)
        .withColumn("qw", F.col("idf"))
    )
    q_norm = q_w.groupBy("query_id").agg(
        F.sqrt(F.sum(F.col("qw") * F.col("qw"))).alias("q_norm")
    )
    # the broadcast query side already carries each term's idf, so the dots
    # pass needs NO tf x term_stats join: the broadcast hash join on term is
    # simultaneously the doc-weight lookup and the query-term filter over tf
    dots = (
        tf.join(F.broadcast(q_w.select("query_id", *join_keys, "qw", "idf")),
                join_keys)
        .withColumn("w", F.col("tf").cast("double") * F.col("idf"))
        .groupBy("query_id", "docid")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
    )
    sims = (
        dots.join(doc_norm, "docid")
        .join(F.broadcast(q_norm), "query_id")
        .withColumn("score", F.col("dot") / (F.col("doc_norm") * F.col("q_norm")))
    )
    return topk_per_group(sims, ["query_id"], "score", "docid", k).select(
        "query_id", "rank", "docid", "score"
    )
