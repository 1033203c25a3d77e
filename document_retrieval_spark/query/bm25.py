"""Exhaustive (non-pruned) BM25 scorer as a declarative DataFrame plan.

This is the differential-testing twin of the WAND scorer (SURVEY.md §7 M3)
and the shape the DuckDB oracle can replicate 1:1. The retrieval core is
exactly the reference's semantics re-expressed relationally:

  J1  query_terms ⋈ tf on (lang,) term     — the inverted-index probe
      (`bm25_ranking.ipynb cell 3:33-34`); BROADCAST: the query side is tiny
      (2k queries x ≤6 terms), so no shuffle touches the big tf table.
  J2  term stats ride along (idf)          (`cosine_similarity_bm25_reranking.py:190-191`)
  J3  ⋈ doc lengths on docid               (`final_implementation.py:140-141`)
  A6  groupBy(query_id, docid).sum(term_score) — the score accumulator
      (`cell 3:28-39`)
  T1  window top-k with tie rule (score desc, docid asc)

Scale notes:
- only docs containing ≥1 query term are ever materialized (inner-join
  pruning == the reference's inverted-index pruning, `cell 3:31-39`);
- the single real shuffle is the A6 aggregation, keyed (query_id, docid) —
  high cardinality, uniformly distributed, partial aggs apply;
- dl is joined AFTER the tf⋈terms join so the join input is already pruned
  to candidate postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import BM25Config, TokenizerConfig
from ..functions.text import tokenize_expr
from ..operators.topk import topk_per_group


def prepare_query_terms(
    queries: DataFrame,
    cfg: TokenizerConfig,
    bm25: BM25Config,
    query_col: str = "query",
    lang_col: str | None = None,
) -> DataFrame:
    """queries(query_id, query[, lang]) -> (query_id[, lang], term), with
    distinct terms per query when cfg says so (set(query), `cell 3:29`)."""
    keys = ["query_id"] + ([lang_col] if lang_col else [])
    if cfg.lemmatize or cfg.stem_lang:
        from ..functions.text import tokenize_pandas_udf

        tok = tokenize_pandas_udf(cfg)(F.col(query_col))
    else:
        tok = tokenize_expr(F.col(query_col), cfg)
    exploded = queries.select(*keys, F.explode(tok).alias("term"))
    if bm25.unique_query_terms:
        exploded = exploded.dropDuplicates(keys + ["term"])
    return exploded


def bm25_term_score(bm25: BM25Config):
    """Column expression for one (term, doc) partial score — SURVEY §2.9
    variant 1 by default (NO b* on dl/avgdl), standard form via config."""
    tf = F.col("tf").cast("double")
    rel = F.col("dl").cast("double") / F.col("avgdl")
    if bm25.length_norm == "standard":
        rel = F.lit(bm25.b) * rel
    denom = tf + F.lit(bm25.k1) * (F.lit(1.0 - bm25.b) + rel)
    return F.col("idf") * tf * F.lit(bm25.k1 + 1.0) / denom


def bm25_score_exhaustive(
    query_terms: DataFrame,
    tf: DataFrame,
    term_stats: DataFrame,
    doc_stats: DataFrame,
    bm25: BM25Config,
    k: int = 10,
    lang_col: str | None = None,
) -> DataFrame:
    """-> (query_id, rank, docid, score) top-k per query.

    bm25.dl_mode="query_terms" (variant 3,
    `cosine_similarity_bm25_reranking.py:187`) replaces dl with the
    query-dependent sum of the doc's tf over the query's matched terms — a
    window sum over the already-joined (query_id, docid) group, no extra
    join. Variant 5's "idf inside the numerator"
    (`text_preprocessing_and_stopwords_setup.py:185-187`) is algebraically
    identical to idf * quotient, so it needs no separate form."""
    join_keys = ["term"] + ([lang_col] if lang_col else [])
    stats_cols = join_keys + ["idf", "avgdl"]
    candidates = (
        tf.join(F.broadcast(query_terms), join_keys)
        .join(F.broadcast(term_stats.select(*stats_cols)), join_keys)
        .join(doc_stats.select("docid", "dl"), "docid")
    )
    if bm25.dl_mode == "query_terms":
        from pyspark.sql import Window

        w = Window.partitionBy("query_id", "docid")
        candidates = candidates.withColumn("dl", F.sum("tf").over(w))
    scored = (
        candidates.withColumn("term_score", bm25_term_score(bm25))
        .groupBy("query_id", "docid")
        .agg(F.sum("term_score").alias("score"))
    )
    return topk_per_group(scored, ["query_id"], "score", "docid", k).select(
        "query_id", "rank", "docid", "score"
    )
