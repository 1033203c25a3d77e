"""Distributed dense-ordinal assignment (shared two-pass pattern).

Assigns rank ordinals equal to ``row_number() OVER (ORDER BY order_cols)``
WITHOUT a global single-partition window — the pattern behind doc ordinals
(operators/postings.py) and the shingle dictionary (operators/dedup.py):

1. range-partition by the order columns (P ordered ranges), persist;
2. local rank within each range partition (window keyed by partition id —
   groups are the range partitions themselves, so no single hot reducer);
3. per-partition counts -> cumulative offsets. The counts table is ONE ROW
   PER PARTITION, so the prefix sum is computed as a triangular self-join
   (sum of counts of all lower partition ids) — O(P^2) rows over tiny P, no
   global window (an ORDER-BY-only window funnels through one partition and
   warns; Catalyst folds away constant partition keys, so partitionBy(lit)
   doesn't avoid it);
4. offsets broadcast-joined back: ordinal = offset + local rank.

Output ordinals are deterministic regardless of where the sampled range
boundaries fall: local rank + cumulative offset == global rank by the order
columns (ties must be impossible, i.e. order_cols must be unique — both call
sites rank DISTINCT keys). This is what lets a SQL oracle reproduce ids with
a plain ``row_number() OVER (ORDER BY ...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_rank_ordinals(
    df: DataFrame,
    order_cols: list[str],
    out_col: str,
    n_parts: int | None = None,
    one_based: bool = False,
    approx_rows: int | None = None,
) -> DataFrame:
    """df -> df + out_col (bigint dense rank by order_cols, 0- or 1-based).

    Rows must be unique in order_cols (callers rank distinct keys). All other
    columns pass through unchanged.

    `approx_rows`: driver-known scale hint (callers that generated or
    counted the keys already). Ranking is memory-light (the sort carries
    the key columns only), so below ~500k keys per partition fewer range
    partitions are strictly better: with n_parts == 1 the RangePartitioner
    SKIPS its sampling pass entirely — one whole Spark job of fixed floor
    off the build (measured dominating the ordinal phase's N->4N scaling
    at the 1M-turn probe, BENCH.md r5). At 10^12-doc scale the hint yields
    thousands of partitions and the plan is the distributed two-pass one.
    """
    if n_parts is None and approx_rows is not None:
        par = df.sparkSession.sparkContext.defaultParallelism
        n_parts = max(1, min(par, approx_rows // 500_000))
    n_parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    if n_parts == 1:
        # Single-range case: a global-order window is DETERMINISTIC (no
        # sampled boundaries to pin), so the materialization barrier below
        # is unnecessary — the rank computes lazily INSIDE whatever job
        # consumes it: zero extra Spark jobs of fixed floor (measured on
        # the 1M-turn scaling probe, BENCH.md r5). The one-reducer sort is
        # deliberate and bounded: callers only reach n_parts == 1 via the
        # approx_rows hint (< 500k keys) or explicitly.
        w1 = Window.orderBy(*order_cols)
        base1 = 1 if one_based else 0
        return df.withColumn(
            out_col,
            (F.row_number().over(w1) - F.lit(1) + F.lit(base1)).cast("long"),
        )
    # Materialize ONCE (localCheckpoint, eager): both consumers below — the
    # per-partition counts and the final join — must observe the SAME range
    # boundaries and row order, and two separate executions of a
    # repartitionByRange plan can sample different boundaries. Unlike
    # DataFrame.persist(), which CacheManager pins until an explicit
    # unpersist (repeated calls in a long-lived session accumulate cached
    # partitions), localCheckpoint blocks are reclaimed by the
    # ContextCleaner as soon as the frame becomes unreachable. On a
    # multi-executor cluster with executor churn, swap for a reliable
    # checkpoint dir (sc.setCheckpointDir) — localCheckpoint truncates
    # lineage, so a lost executor cannot recompute its blocks.
    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    # prefix sum over one row per partition: triangular self-join, no window
    prior = counts.select(
        F.col("_pid").alias("_pid2"), F.col("_cnt").alias("_cnt2")
    )
    offsets = (
        counts.join(F.broadcast(prior), F.col("_pid2") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_cnt2"), F.lit(0)).alias("_off"))
    )
    base = 0 if one_based else -1
    return (
        ranged.withColumn("_local", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col, (F.col("_off") + F.col("_local") + F.lit(base)).cast("long")
        )
        .drop("_pid", "_local", "_off")
    )
