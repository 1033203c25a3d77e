"""Distributed inverted-index construction (SURVEY.md §7 M2; north_rule core).

Pipeline shape (the Spark-first successor of team_run1's map -> driver-merge,
`team_run1.py:80-121`, whose single-threaded reduce we replace with a
term-sharded shuffle):

  tf(docid, term, tf) ⋈ doc ordinals/lengths
    -> [salt hot terms]  groupBy(term, salt): sorted partial posting arrays
    -> groupBy(term):    merge partials (flatten + array_sort — JVM-side)
    -> segment + encode: Arrow pandas UDF, delta+varbyte blocks w/ block-max
    -> postings table partitioned by shard

Skew handling is explicit (north_rule): a df pre-pass marks hot terms
(df > salt_df_threshold); their per-(term,salt) partials bound any single
reduce group to ~df/n_salts postings — the engine's answer to the 20x en-shard
skew the reference hard-codes around (`final_implementation.py:228`).

Block-max metadata: each 128-posting block stores max_q = max over the block
of the BM25 tf/length quotient  tf*(k1+1)/(tf + k1*(1-b+dl/avgdl)); a term's
score upper bound in that block is idf*max_q. Safe for WAND because variant-1
idf = log1p(...) >= 0 (SURVEY §2.9).

Scale notes:
- doc ordinals come from zipWithIndex on a range-partitioned sort — the one
  legitimate RDD use (no driver collect, no single-partition window).
- hot terms are additionally split into SEGMENT rows of <= seg_postings
  postings so no single output row exceeds ~hundreds of KB (a df=10^9 term
  becomes ~8k rows, not one 3 GB row).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import BM25Config, IndexConfig
from .codec import delta_encode, vb_encode

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("base", T.LongType()),      # first doc ordinal in block
        T.StructField("last", T.LongType()),      # last doc ordinal in block
        T.StructField("n", T.IntegerType()),
        T.StructField("max_q", T.DoubleType()),   # block-max BM25 quotient
        T.StructField("docs", T.BinaryType()),    # delta+varbyte ordinals
        T.StructField("tfs", T.BinaryType()),     # varbyte tfs
        T.StructField("dls", T.BinaryType()),     # varbyte doc lengths
    ]
)

SEGMENT_SCHEMA_FIELDS = """
    term string, shard int, seg_id int, n_segs int,
    df bigint, n_postings int, first_ord bigint, last_ord bigint,
    max_q double
"""


def assign_doc_ordinals(docs: DataFrame, n_parts: int | None = None) -> DataFrame:
    """docs(docid, ...) -> + doc_ord (dense 0..N-1, ascending by docid).

    Fully distributed dense-id assignment, JVM-only (no zipWithIndex: the RDD
    path would pickle every row through Python). Classic two-pass offsets:

    1. range-partition by docid (P ranges), cache;
    2. local rank within each range partition (window keyed by partition id —
       groups are the range partitions themselves, so no single hot reducer);
    3. tiny per-partition counts -> cumulative offsets, broadcast-joined back.

    Replaces the reference's positional index<->docid mapping
    (`bm25_ranking.ipynb cell 6:19-20`) without driver-side arrays.
    """
    from pyspark.sql import Window

    n_parts = n_parts or docs.sparkSession.sparkContext.defaultParallelism
    ranged = (
        docs.repartitionByRange(n_parts, "docid")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    w_local = Window.partitionBy("_pid").orderBy("docid")
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))
    ).select("_pid", "_off")
    out = (
        ranged.withColumn("_local", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "_pid")
        .withColumn("doc_ord", (F.col("_off") + F.col("_local") - 1).cast("long"))
        .drop("_pid", "_local", "_off")
    )
    return out


def quotient_expr(bm25: BM25Config):
    """The per-posting BM25 quotient (score = idf * quotient)."""
    tf = F.col("tf").cast("double")
    rel = F.col("dl").cast("double") / F.col("avgdl")
    if bm25.length_norm == "standard":
        rel = F.lit(bm25.b) * rel
    return tf * F.lit(bm25.k1 + 1.0) / (tf + F.lit(bm25.k1) * (F.lit(1.0 - bm25.b) + rel))


def _encode_udf(block_size: int, seg_postings: int):
    """Arrow pandas UDF: per-term sorted postings arrays -> encoded segments.

    Takes FOUR primitive array columns (doc_ords, tfs, dls, qs) rather than
    one array<struct>: Arrow hands primitive lists to pandas as numpy arrays,
    so the codec runs fully vectorized — array<struct> would arrive as python
    dicts per element (measured ~2x slower end-to-end).
    """
    out_schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("seg_id", T.IntegerType()),
                T.StructField("n_segs", T.IntegerType()),
                T.StructField("n_postings", T.IntegerType()),
                T.StructField("first_ord", T.LongType()),
                T.StructField("last_ord", T.LongType()),
                T.StructField("max_q", T.DoubleType()),
                T.StructField("blocks", T.ArrayType(BLOCK_SCHEMA)),
            ]
        )
    )

    @F.pandas_udf(out_schema)
    def encode(
        doc_ords: pd.Series, tf_arr: pd.Series, dl_arr: pd.Series, q_arr: pd.Series
    ) -> pd.Series:
        def one(ords, tfs, dls, qs):
            ords = np.asarray(ords, dtype=np.int64)
            tfs = np.asarray(tfs, dtype=np.int64)
            dls = np.asarray(dls, dtype=np.int64)
            qs = np.asarray(qs, dtype=np.float64)
            n = ords.size
            n_segs = max(1, -(-n // seg_postings))
            segs = []
            for s in range(n_segs):
                lo, hi = s * seg_postings, min((s + 1) * seg_postings, n)
                so, st, sd, sq = ords[lo:hi], tfs[lo:hi], dls[lo:hi], qs[lo:hi]
                blocks = []
                for b0 in range(0, so.size, block_size):
                    b1 = min(b0 + block_size, so.size)
                    blocks.append(
                        {
                            "base": int(so[b0]),
                            "last": int(so[b1 - 1]),
                            "n": int(b1 - b0),
                            "max_q": float(sq[b0:b1].max()),
                            "docs": delta_encode(so[b0:b1]),
                            "tfs": vb_encode(st[b0:b1]),
                            "dls": vb_encode(sd[b0:b1]),
                        }
                    )
                segs.append(
                    {
                        "seg_id": s,
                        "n_segs": n_segs,
                        "n_postings": int(hi - lo),
                        "first_ord": int(so[0]),
                        "last_ord": int(so[-1]),
                        "max_q": float(sq.max()),
                        "blocks": blocks,
                    }
                )
            return segs

        return pd.Series(
            [one(o, t, d, q) for o, t, d, q in
             zip(doc_ords, tf_arr, dl_arr, q_arr)]
        )

    return encode


def build_postings(
    tf_ord: DataFrame,        # (docid, doc_ord, term, tf, dl)
    term_stats: DataFrame,    # (term, df, idf, n_docs, avgdl)
    idx_cfg: IndexConfig,
    bm25: BM25Config,
    seg_postings: int = 128 * 1024,
) -> DataFrame:
    """-> encoded postings table:
    (term, shard, seg_id, n_segs, df, idf, n_postings, first_ord, last_ord,
     max_q, blocks array<BLOCK>).

    ONE raw-posting shuffle, keyed (term, salt) with explicit hot-term
    salting by DOC-ORDINAL RANGE: salt = doc_ord // seg_postings for terms
    whose df exceeds the threshold (df pre-pass), 0 otherwise. Range salting
    beats hash salting here because salted groups are doc-contiguous and
    disjoint — every group IS a final index segment, so there is no second
    merge shuffle and no flatten+re-sort of raw postings (the previous
    two-stage design moved every posting twice and re-sorted hot terms in a
    single reducer). A hot group's size is bounded by the range width by
    construction. Per-term segment numbering happens AFTER encode, over the
    ~3 B/posting compressed rows (cheap window by term).
    """
    hot = term_stats.select(
        "term",
        (F.col("df") > idx_cfg.salt_df_threshold).alias("is_hot"),
        "df",
        "idf",
        "avgdl",
    )
    enriched = tf_ord.join(F.broadcast(hot), "term").withColumn(
        "q", quotient_expr(bm25)
    )
    salted = enriched.withColumn(
        "salt",
        F.when(
            F.col("is_hot"),
            (F.col("doc_ord") / F.lit(seg_postings)).cast("long"),
        ).otherwise(F.lit(0)),
    )
    groups = salted.groupBy("term", "salt").agg(
        F.sort_array(
            F.collect_list(F.struct("doc_ord", "tf", "dl", "q"))
        ).alias("postings"),
        F.first("df").alias("df"),
        F.first("idf").alias("idf"),
    )
    shard = F.pmod(F.xxhash64("term"), F.lit(idx_cfg.n_shards)).cast("int")
    encode = _encode_udf(idx_cfg.block_size, seg_postings)
    # split the sorted struct array into primitive arrays JVM-side: Arrow
    # moves them to Python as numpy, keeping the codec vectorized
    enc = (
        groups.withColumn("shard", shard)
        .withColumn(
            "segs",
            encode(
                F.transform("postings", lambda s: s["doc_ord"]),
                F.transform("postings", lambda s: s["tf"]),
                F.transform("postings", lambda s: s["dl"]),
                F.transform("postings", lambda s: s["q"]),
            ),
        )
        .drop("postings")
    )
    seg = enc.select(
        "term", "shard", "df", "idf", F.explode("segs").alias("seg")
    ).select(
        "term",
        "shard",
        "df",
        "idf",
        F.col("seg.n_postings").alias("n_postings"),
        F.col("seg.first_ord").alias("first_ord"),
        F.col("seg.last_ord").alias("last_ord"),
        F.col("seg.max_q").alias("max_q"),
        F.col("seg.blocks").alias("blocks"),
    )
    # dense per-term segment ids over the compressed rows (metadata only —
    # the WAND cursor orders segments by first_ord, not seg_id)
    from pyspark.sql import Window

    w = Window.partitionBy("term").orderBy("first_ord")
    return (
        seg.withColumn("seg_id", (F.row_number().over(w) - 1).cast("int"))
        .withColumn(
            "n_segs",
            F.count("*").over(Window.partitionBy("term")).cast("int"),
        )
        .select(
            "term", "shard", "seg_id", "n_segs", "df", "idf", "n_postings",
            "first_ord", "last_ord", "max_q", "blocks",
        )
    )


def decode_postings_df(postings: DataFrame) -> DataFrame:
    """Decode an encoded postings table back to long form
    (term, doc_ord, tf, dl) — used by round-trip tests and as a recovery path.
    """
    from .codec import delta_decode, vb_decode

    out_schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("doc_ord", T.LongType()),
                T.StructField("tf", T.IntegerType()),
                T.StructField("dl", T.IntegerType()),
            ]
        )
    )

    @F.pandas_udf(out_schema)
    def decode(blocks: pd.Series) -> pd.Series:
        def one(blist):
            rows = []
            for b in blist:
                ords = delta_decode(bytes(b["docs"]))
                tfs = vb_decode(bytes(b["tfs"]))
                dls = vb_decode(bytes(b["dls"]))
                rows.extend(
                    {"doc_ord": int(o), "tf": int(t), "dl": int(d)}
                    for o, t, d in zip(ords, tfs, dls)
                )
            return rows

        return blocks.map(one)

    return postings.select(
        "term", F.explode(decode(F.col("blocks"))).alias("p")
    ).select("term", "p.doc_ord", "p.tf", "p.dl")
