"""IR evaluation aggregates Spark-side (SURVEY.md §2.4 A11).

Recall@k = mean hit indicator (`bm25_ranking.ipynb cell 5:1-30`);
MRR@k = mean reciprocal rank of the first relevant hit
(`team_run1.py:307-325`). Semantics must equal oracle_metrics exactly
(SURVEY §5.2 item 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_mrr(
    topk: DataFrame,      # (query_id, rank, docid, ...)
    truth: DataFrame,     # (query_id, positive_docs)
    ks=(1, 5, 10),
    mrr_k: int = 10,
) -> DataFrame:
    """-> single row (recall@1, recall@5, recall@10, mrr@<mrr_k>).

    The reciprocal-rank term is capped at rank <= mrr_k (oracle_metrics and
    the SQL twin slice to the top-mrr_k rows; without the cap the two diverge
    whenever the caller retrieves k > mrr_k rows)."""
    hit = topk.join(F.broadcast(truth), "query_id").withColumn(
        "is_pos", (F.col("docid") == F.col("positive_docs")).cast("int")
    )
    per_q = hit.groupBy("query_id").agg(
        *[
            F.max(F.when(F.col("rank") <= k, F.col("is_pos")).otherwise(0)).alias(
                f"hit{k}"
            )
            for k in ks
        ],
        F.max(
            F.when(
                (F.col("is_pos") == 1) & (F.col("rank") <= mrr_k),
                1.0 / F.col("rank"),
            ).otherwise(0.0)
        ).alias("rr"),
    )
    # queries with no retrieved rows at all count as misses
    all_q = truth.select("query_id").distinct()
    per_q = all_q.join(per_q, "query_id", "left").na.fill(0)
    return per_q.agg(
        *[F.avg(f"hit{k}").alias(f"recall@{k}") for k in ks],
        F.avg("rr").alias(f"mrr@{mrr_k}"),
    )
