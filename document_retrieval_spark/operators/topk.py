"""Top-k per group (SURVEY.md §2.6 T1/T3/T5).

The reference uses argpartition (`bm25_ranking.ipynb cell 3:42-49`), heaps
(`team_run1.py:195-196`) and full sorts; the Spark-native form is a rank
window, which Catalyst rewrites into a per-partition bounded TopK
(WindowGroupLimit / rank-filter pushdown) — no global sort, no full
materialization of per-group orderings.

Tie rule (engine-wide, SURVEY §2.6 T7): (score desc, docid asc) — the
reference's np.argsort leaves ties unspecified; we define them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    score_col: str = "score",
    id_col: str = "docid",
    k: int = 10,
    rank_col: str = "rank",
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
