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

def assign_doc_ordinals(docs: DataFrame, n_parts: int | None = None,
                        approx_rows: int | None = None) -> DataFrame:
    """docs(docid, ...) -> + doc_ord (dense 0..N-1, ascending by docid).

    Fully distributed dense-id assignment, JVM-only (no zipWithIndex: the RDD
    path would pickle every row through Python) — the two-pass range-partition
    + local-rank + broadcast-offsets pattern of operators/ordinals.py.
    `approx_rows` is the driver-known doc-count hint (see
    ordinals.dense_rank_ordinals — small corpora then skip the range
    sampling job).

    Replaces the reference's positional index<->docid mapping
    (`bm25_ranking.ipynb cell 6:19-20`) without driver-side arrays.
    """
    from .ordinals import dense_rank_ordinals

    return dense_rank_ordinals(docs, ["docid"], "doc_ord", n_parts=n_parts,
                               approx_rows=approx_rows)


def _segment_schema(lang_col: str | None, key_col: str = "term") -> str:
    lang = f"{lang_col} string, " if lang_col else ""
    key = "term_id bigint" if key_col == "term_id" else "term string"
    return (
        f"{key}, {lang}"
        "n_postings int, first_ord bigint, last_ord bigint, max_q double, "
        "blocks array<struct<base:bigint,last:bigint,n:int,max_q:double,"
        "docs:binary,tfs:binary,dls:binary>>"
    )


def _quotient_np(tfs: np.ndarray, dls: np.ndarray, bm25: BM25Config,
                 avgdl) -> np.ndarray:
    """Per-posting BM25 quotient, BIT-IDENTICAL to the WAND cursor's
    arithmetic (`query/wand.py _Cursor.cur_score`): same operand order, same
    float64 ops, so a block's stored max quotient is an exact upper bound of
    every cursor-computed score in that block (multiplying by a positive idf
    is monotone). `avgdl` may be a scalar or a per-row array."""
    one_minus_b = 1.0 - bm25.b
    b_over = (bm25.b / avgdl) if bm25.length_norm == "standard" else (1.0 / avgdl)
    return tfs * (bm25.k1 + 1.0) / (tfs + bm25.k1 * (one_minus_b + dls * b_over))


def _encode_group(ords, tfs, dls, qs, block_size, seg_postings):
    """Encode one sorted (term, salt) group -> list of segment part-dicts
    (splitting if the group exceeds seg_postings)."""
    n = ords.size
    segs = []
    for s in range(max(1, -(-n // seg_postings))):
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
                "n_postings": int(hi - lo),
                "first_ord": int(so[0]),
                "last_ord": int(so[-1]),
                "max_q": float(sq.max()),
                "blocks": blocks,
            }
        )
    return segs


def _encode_partitions(block_size: int, seg_postings: int, lang_col: str | None,
                       bm25: BM25Config, avgdl_by_lang: dict,
                       key_col: str = "term"):
    """mapInPandas encoder over FLAT rows sorted by (term[, lang], salt,
    doc_ord) within each partition. Groups are contiguous; the trailing
    (possibly incomplete) group of each Arrow batch is carried into the next
    batch, and flushed at end-of-partition. All data crosses the Arrow
    boundary as plain primitive columns — the fast path.

    The block-bound quotient is computed HERE (numpy, from tf/dl plus the
    broadcast-scalar avgdl) rather than shuffled: per-term constants (df,
    idf, shard) and per-posting derivations have no business riding an
    O(postings) shuffle when they can be recomputed or re-joined over the
    ~1000x smaller encoded-segment rows."""
    out_cols = (
        [key_col] + ([lang_col] if lang_col else [])
        + ["n_postings", "first_ord", "last_ord", "max_q", "blocks"]
    )
    key_is_id = key_col == "term_id"

    def encode_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        terms = (
            pdf[key_col].to_numpy(np.int64)
            if key_is_id
            else pdf[key_col].to_numpy()
        )
        # PACKED shuffle columns (build_postings packs them): _os carries
        # salt<<40 | doc_ord (sorting by _os IS sorting by (salt, doc_ord)
        # — salt occupies the high bits), _td carries tf<<32 | dl. ~16
        # uncompressible bytes per raw posting row off the one big shuffle
        # vs four separate fields, and the sort key is a single long.
        os_ = pdf["_os"].to_numpy(np.int64)
        td = pdf["_td"].to_numpy(np.int64)
        salts = os_ >> np.int64(40)
        ords = os_ & np.int64((1 << 40) - 1)
        tfs = td >> np.int64(32)
        dls = td & np.int64(0xFFFFFFFF)
        change = np.ones(len(pdf), dtype=bool)
        change[1:] = (terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])
        if lang_col:
            langs = pdf[lang_col].to_numpy()
            change[1:] |= langs[1:] != langs[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(pdf))
        if lang_col:
            # explicit dict lookup per distinct language: a missing (or NA)
            # language must KeyError at build time, not silently map to NaN
            # quotients and unusable block bounds
            uniq, inv = np.unique(langs, return_inverse=True)
            vals = np.array([avgdl_by_lang[u] for u in uniq], dtype=np.float64)
            avgdls = vals[inv]
        else:
            avgdls = avgdl_by_lang[None]
        qs = _quotient_np(
            tfs.astype(np.float64), dls.astype(np.float64), bm25, avgdls
        )
        rows = []
        for s, e in zip(starts, ends):
            for part in _encode_group(
                ords[s:e], tfs[s:e], dls[s:e], qs[s:e], block_size, seg_postings
            ):
                key_val = int(terms[s]) if key_is_id else terms[s]
                row = {key_col: key_val, **part}
                if lang_col:
                    row[lang_col] = langs[s]
                rows.append(row)
        return pd.DataFrame(rows, columns=out_cols)

    # carry detection compares the group key (key_col[, lang], salt); salt
    # is the high 24 bits of the packed _os column
    carry_cols = [key_col] + ([lang_col] if lang_col else [])

    def fn(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
            if not len(pdf):
                continue
            # the trailing group is contiguous at the end (sorted input)
            mask = np.ones(len(pdf), dtype=bool)
            for c in carry_cols:
                col = pdf[c].to_numpy()
                mask &= col == pdf.iloc[-1][c]
            os_np = pdf["_os"].to_numpy(np.int64) >> np.int64(40)
            mask &= os_np == os_np[-1]
            # length of the trailing run of True
            rev = mask[::-1]
            n_tail = int(np.argmin(rev)) if not rev.all() else len(pdf)
            head, carry = pdf.iloc[: len(pdf) - n_tail], pdf.iloc[len(pdf) - n_tail :]
            if len(head):
                yield encode_groups(head)
        if carry is not None and len(carry):
            yield encode_groups(carry)

    return fn


def _encode_partitions_arrow(block_size: int, seg_postings: int,
                             lang_col: str | None, bm25: BM25Config,
                             avgdl_by_lang: dict, key_col: str = "term"):
    """mapInArrow twin of `_encode_partitions` — same input contract (FLAT
    rows sorted by (key[, lang], salt, doc_ord) within each partition, salt
    and doc_ord packed in _os, tf and dl packed in _td), same output
    segments byte-for-byte, with the per-block Python eliminated:

    - group/segment/block boundaries are computed as numpy index arrays
      (blocks tile each batch contiguously, so one `np.maximum.reduceat`
      yields every block's max quotient);
    - the three varbyte streams are encoded ONCE over the whole batch
      (codec.vb_encode_offsets) and blocks become int32 offset slices into
      that buffer — the output BinaryArrays are built directly from the
      offsets and the shared data buffer, zero per-block copies;
    - term strings never surface as Python objects: group-change detection
      runs on dictionary-encoded indices and output keys are an Arrow
      `take` at segment starts.

    The pandas encoder spent ~13 us/posting building per-block dicts and
    re-invoking the codec per 128-posting block (measured r6, sf0.1); this
    path is the same arithmetic over whole batches. The per-doc pandas
    encoder remains behind SPARK_GRAFT_ENCODER=pandas as the executable
    spec; tests assert segment equality between the two."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .codec import vb_encode_offsets

    key_is_id = key_col == "term_id"
    mask40 = np.int64((1 << 40) - 1)

    def encode(batch: "pa.RecordBatch", lo: int, hi: int):
        """Encode rows [lo, hi) of `batch` -> output RecordBatch."""
        os_ = batch.column("_os").to_numpy()[lo:hi]
        td = batch.column("_td").to_numpy()[lo:hi]
        key_arr = batch.column(key_col).slice(lo, hi - lo)
        if key_is_id:
            keys_np = key_arr.to_numpy()
        else:
            keys_np = pc.dictionary_encode(key_arr).indices.to_numpy()
        langs_np = lang_vals = None
        if lang_col:
            lang_arr = batch.column(lang_col).slice(lo, hi - lo)
            lang_dict = pc.dictionary_encode(lang_arr)
            langs_np = lang_dict.indices.to_numpy()
            lang_vals = lang_dict.dictionary.to_pylist()
        n = os_.size
        salts = os_ >> np.int64(40)
        ords = os_ & mask40
        tfs = td >> np.int64(32)
        dls = td & np.int64(0xFFFFFFFF)
        change = np.ones(n, dtype=bool)
        change[1:] = (keys_np[1:] != keys_np[:-1]) | (salts[1:] != salts[:-1])
        if langs_np is not None:
            change[1:] |= langs_np[1:] != langs_np[:-1]
        gstarts = np.flatnonzero(change)
        gends = np.append(gstarts[1:], n)
        glens = gends - gstarts
        nsegs = -(-glens // seg_postings)
        seg_of_group = np.repeat(np.arange(gstarts.size), nsegs)
        seg_cum = np.cumsum(nsegs) - nsegs
        seg_in_group = (
            np.arange(int(nsegs.sum())) - seg_cum[seg_of_group]
        )
        seg_starts = gstarts[seg_of_group] + seg_in_group * seg_postings
        seg_ends = np.minimum(seg_starts + seg_postings, gends[seg_of_group])
        seg_lens = seg_ends - seg_starts
        nblocks = -(-seg_lens // block_size)
        blk_of_seg = np.repeat(np.arange(seg_starts.size), nblocks)
        blk_cum = np.cumsum(nblocks) - nblocks
        blk_in_seg = (
            np.arange(int(nblocks.sum())) - blk_cum[blk_of_seg]
        )
        blk_starts = seg_starts[blk_of_seg] + blk_in_seg * block_size
        blk_ends = np.minimum(blk_starts + block_size, seg_ends[blk_of_seg])
        if langs_np is not None:
            # explicit lookup per distinct language: a missing language
            # must KeyError at build time (same contract as the pandas twin)
            vals = np.array([avgdl_by_lang[v] for v in lang_vals],
                            dtype=np.float64)
            avgdls = vals[langs_np]
        else:
            avgdls = avgdl_by_lang[None]
        qs = _quotient_np(
            tfs.astype(np.float64), dls.astype(np.float64), bm25, avgdls
        )
        # delta gaps, absolute at block starts; the strictly-increasing
        # invariant (delta_encode's ValueError) checked batch-wide
        gaps = np.empty(n, dtype=np.int64)
        gaps[0] = ords[0]
        gaps[1:] = ords[1:] - ords[:-1]
        interior = np.ones(n, dtype=bool)
        interior[blk_starts] = False
        if np.any(gaps[interior] <= 0):
            raise ValueError("ordinals must be strictly increasing")
        gaps[blk_starts] = ords[blk_starts]
        docs_buf, docs_off = vb_encode_offsets(gaps.astype(np.uint64))
        tfs_buf, tfs_off = vb_encode_offsets(tfs.astype(np.uint64))
        dls_buf, dls_off = vb_encode_offsets(dls.astype(np.uint64))

        def bin_array(buf: np.ndarray, off: np.ndarray) -> pa.Array:
            o32 = np.append(off[blk_starts], off[-1]).astype(np.int32)
            return pa.Array.from_buffers(
                pa.binary(), blk_starts.size,
                [None, pa.py_buffer(o32.tobytes()),
                 pa.py_buffer(buf.tobytes())],
            )

        blocks_struct = pa.StructArray.from_arrays(
            [
                pa.array(ords[blk_starts], pa.int64()),
                pa.array(ords[blk_ends - 1], pa.int64()),
                pa.array((blk_ends - blk_starts).astype(np.int32), pa.int32()),
                pa.array(np.maximum.reduceat(qs, blk_starts), pa.float64()),
                bin_array(docs_buf, docs_off),
                bin_array(tfs_buf, tfs_off),
                bin_array(dls_buf, dls_off),
            ],
            ["base", "last", "n", "max_q", "docs", "tfs", "dls"],
        )
        list_off = pa.array(
            np.append(blk_cum, blk_of_seg.size).astype(np.int32), pa.int32()
        )
        blocks_list = pa.ListArray.from_arrays(list_off, blocks_struct)
        seg_idx = pa.array(seg_starts, pa.int64())
        cols = [key_arr.take(seg_idx)]
        names = [key_col]
        if lang_col:
            cols.append(lang_arr.take(seg_idx))
            names.append(lang_col)
        cols += [
            pa.array(seg_lens.astype(np.int32), pa.int32()),
            pa.array(ords[seg_starts], pa.int64()),
            pa.array(ords[seg_ends - 1], pa.int64()),
            pa.array(np.maximum.reduceat(qs, seg_starts), pa.float64()),
            blocks_list,
        ]
        names += ["n_postings", "first_ord", "last_ord", "max_q", "blocks"]
        return pa.RecordBatch.from_arrays(cols, names)

    carry_cols = [key_col] + ([lang_col] if lang_col else [])

    def tail_group_start(batch: "pa.RecordBatch") -> int:
        """Index where the trailing (key[, lang], salt) group begins."""
        n = batch.num_rows
        same = np.ones(n, dtype=bool)
        for c in carry_cols:
            col = batch.column(c)
            lastv = col.slice(n - 1, 1)
            same &= pc.equal(col, lastv[0]).to_numpy(zero_copy_only=False)
        salts = batch.column("_os").to_numpy() >> np.int64(40)
        same &= salts == salts[-1]
        rev = same[::-1]
        n_tail = int(np.argmin(rev)) if not rev.all() else n
        return n - n_tail

    def fn(batches):
        carry: "pa.RecordBatch | None" = None
        for b in batches:
            if carry is not None and carry.num_rows:
                b = pa.RecordBatch.from_arrays(
                    [pa.concat_arrays([carry.column(i), b.column(i)])
                     for i in range(b.num_columns)],
                    schema=b.schema,
                )
            carry = None
            if not b.num_rows:
                continue
            t = tail_group_start(b)
            if t > 0:
                yield encode(b, 0, t)
            carry = b.slice(t)
        if carry is not None and carry.num_rows:
            yield encode(carry, 0, carry.num_rows)

    return fn


def build_postings(
    tf_ord: DataFrame,        # (docid, doc_ord, term, tf, dl[, lang])
    term_stats: DataFrame,    # (term[, lang], df, idf, n_docs, avgdl)
    idx_cfg: IndexConfig,
    bm25: BM25Config,
    seg_postings: int = 128 * 1024,
    lang_col: str | None = None,
    avgdl_by_lang: dict | float | None = None,
    stats_broadcast: bool = True,
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
    keys = ["term"] + ([lang_col] if lang_col else [])
    # stats_broadcast=False for extreme vocabularies (~10^8+ terms at the
    # 10^12-turn target, where a stats broadcast no longer fits an
    # executor): both stats joins fall back to plain joins and AQE picks a
    # shuffle strategy; the hot join then shuffles tf on term — acceptable
    # because that is the very shuffle key the assembly repartition uses.
    _maybe_b = F.broadcast if stats_broadcast else (lambda df: df)
    # INT TERM IDS through the posting shuffle WHEN THE CALLER PROVIDES
    # THEM (term dictionary mode — IndexBuilder's vocab stage, or bench's
    # SPARK_GRAFT_TERM_DICT arm): the raw-posting exchange (and its sort)
    # then keys and carries an int64 `term_id` instead of the term string,
    # and strings are restored on the ~1000x-smaller encoded-segment rows
    # by the dictionary join below. Without caller-provided ids the
    # shuffle keys on the term string directly: deriving ids here
    # (a vocab-sized dense-ordinal sort) was measured costing ~1.5-2 s of
    # job floor per build at sf0.1 — more than the short synthetic keys
    # save (BENCH.md r4 A/B).
    have_ids = "term_id" in tf_ord.columns and "term_id" in term_stats.columns
    key_col = "term_id" if have_ids else "term"
    if have_ids:
        stats_id = term_stats
        hot = stats_id.select(
            "term_id", (F.col("df") > idx_cfg.salt_df_threshold).alias("is_hot")
        )
        salted_src = tf_ord.join(_maybe_b(hot), "term_id")
    else:
        hot = term_stats.select(
            *keys, (F.col("df") > idx_cfg.salt_df_threshold).alias("is_hot")
        )
        salted_src = tf_ord.join(_maybe_b(hot), keys)
    # avgdl reaches the encoder as a broadcast scalar per language (one tiny
    # collect), NOT as an O(postings) shuffle column
    if avgdl_by_lang is None:
        if lang_col:
            avgdl_by_lang = {
                r[lang_col]: float(r["avgdl"])
                for r in term_stats.select(lang_col, "avgdl").distinct().collect()
            }
        else:
            avgdl_by_lang = {
                None: float(term_stats.select("avgdl").first()["avgdl"])
            }
    elif not isinstance(avgdl_by_lang, dict):
        avgdl_by_lang = {None: float(avgdl_by_lang)}
    salted = salted_src.withColumn(
        "salt",
        F.when(
            F.col("is_hot"),
            (F.col("doc_ord") / F.lit(seg_postings)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    # SORT-BASED assembly: shuffle FLAT rows partitioned by (term, salt) and
    # sorted by doc_ord, then encode groups in mapInPandas with carry-over at
    # batch boundaries. Flat primitive columns are the Arrow fast path — the
    # previous collect_list + array<struct> design spent ~16s/129k-turn build
    # just serializing nested arrays JVM->Python (measured with a no-op UDF);
    # this path moves the same data as plain columnar batches.
    # The shuffle carries ONLY (term[, lang], salt, doc_ord, tf, dl): the
    # per-posting quotient is derived in the encoder, and per-TERM constants
    # (df, idf, shard) re-attach over the encoded-segment rows below —
    # dropping ~28 uncompressible bytes from every raw posting row.
    lang_flat = [lang_col] if lang_col else []
    # PACK the per-posting fields into two longs for the one big shuffle:
    # _os = salt<<40 | doc_ord (sorting by _os == sorting by (salt,
    # doc_ord); partitioning hashes the high bits back out), _td =
    # tf<<32 | dl. UnsafeRow spends 8 bytes per fixed-width field
    # regardless of declared width, so two fields instead of four is ~16
    # uncompressible bytes per raw posting row off the exchange (~29% of
    # the non-key row) and the secondary sort key becomes one long
    # (radix-friendly prefix). Bounds: doc_ord < 2^40 (~10^12 docs, 50x
    # the 2x10^10-doc target) and salt < 2^23 (= doc_ord/seg_postings at
    # the bound); violations fail loudly rather than pack garbage.
    os_ok = (F.col("doc_ord") >= 0) & (F.col("doc_ord") < F.lit(1 << 40))
    pack_os = F.when(
        os_ok,
        F.shiftleft(F.col("salt").cast("long"), 40) + F.col("doc_ord"),
    ).otherwise(
        F.raise_error(F.concat(
            F.lit("build_postings: doc_ord out of the packable range "
                  "[0, 2^40): "),
            F.col("doc_ord").cast("string"),
        )).cast("long")
    ).alias("_os")
    pack_td = (
        F.shiftleft(F.col("tf").cast("long"), 32)
        + F.col("dl").cast("int").cast("long")
    ).alias("_td")
    flat_cols = [key_col, *lang_flat, pack_os, pack_td]
    # In STRING mode with a lang column the same term string can occur in
    # several languages; lang must be a shuffle/sort key or same-term rows
    # from different languages interleave by doc_ord and the encoder opens a
    # new segment at every alternation (one segment per posting in the worst
    # case). In id mode term_id is unique per (term, lang) by construction,
    # so lang stays out of the key (narrower shuffle rows).
    group_keys = [key_col] + ([] if have_ids else lang_flat)
    # EXPLICIT partition count: a column-only repartition is an AQE
    # coalesce target, and AQE's 64MB advisory size produced 11 tasks on 8
    # cores here (1.4 waves — half the cores idle in the straggler wave,
    # measured +30% on the encode stage via the event log, BENCH.md r5).
    # A user-numbered repartition is exempt from coalescing; size it for
    # whole waves with enough granularity to smooth (term, salt) skew.
    spark = salted.sparkSession
    n_enc = max(
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        spark.sparkContext.defaultParallelism * 4,
    )
    salt_of = F.shiftright(F.col("_os"), 40)
    parted = salted.select(*flat_cols).repartition(n_enc, *group_keys, salt_of)
    parted = parted.sortWithinPartitions(*group_keys, "_os")
    # Arrow-native vectorized encoder by default (whole-batch codec + zero
    # per-block Python — measured ~2x the pandas encoder's stage CPU at
    # sf0.1); SPARK_GRAFT_ENCODER=pandas keeps the per-group pandas twin
    # (the executable spec) selectable for A/B and differential tests.
    import os as _os_mod

    if _os_mod.environ.get("SPARK_GRAFT_ENCODER", "arrow") == "pandas":
        seg = parted.mapInPandas(
            _encode_partitions(idx_cfg.block_size, seg_postings, lang_col,
                               bm25, avgdl_by_lang, key_col=key_col),
            schema=_segment_schema(lang_col, key_col),
        )
    else:
        seg = parted.mapInArrow(
            _encode_partitions_arrow(idx_cfg.block_size, seg_postings,
                                     lang_col, bm25, avgdl_by_lang,
                                     key_col=key_col),
            schema=_segment_schema(lang_col, key_col),
        )
    # dense per-term segment ids over the compressed rows (metadata only —
    # the WAND cursor orders segments by first_ord, not seg_id); df/idf
    # re-join and shard recomputes here, over ~#terms segment rows instead
    # of ~#postings raw rows
    from pyspark.sql import Window

    # restore the string boundary (id mode: segments (term_id) |><| the
    # dictionary over vocab-sized rows) / attach df+idf (string mode);
    # seg_id / n_segs window partitions on the shuffle key either way
    if have_ids:
        if lang_col:
            seg = seg.drop(lang_col)  # restored (with term) by the dict join
        seg = seg.join(
            _maybe_b(stats_id.select(*keys, "term_id", "df", "idf")), "term_id"
        )
    else:
        seg = seg.join(_maybe_b(term_stats.select(*keys, "df", "idf")), keys)
    # seg_id / n_segs number segments within one logical posting list —
    # (term_id) in id mode, (term, lang) in string mode with languages
    w = Window.partitionBy(*group_keys).orderBy("first_ord")
    return (
        seg
        .withColumn(
            "shard", F.pmod(F.xxhash64("term"), F.lit(idx_cfg.n_shards)).cast("int")
        )
        .withColumn("seg_id", (F.row_number().over(w) - 1).cast("int"))
        .withColumn(
            "n_segs",
            F.count("*").over(Window.partitionBy(*group_keys)).cast("int"),
        )
        .select(
            # id mode persists term_id ALONGSIDE the string: query-time
            # probes can then push In(term_id, ...) — int64 parquet
            # stats/dictionaries prune better than string IN at 10^8-term
            # vocabularies (query/wand.py id-pushdown path)
            *keys, *(["term_id"] if have_ids else []),
            "shard", "seg_id", "n_segs", "df", "idf",
            "n_postings", "first_ord", "last_ord", "max_q", "blocks",
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
