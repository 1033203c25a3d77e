"""Block-max WAND top-k scorer over the compressed postings table
(SURVEY.md §7 M3; north_rule: "posting-list intersect with block-max WAND
pruning and a bounded min-heap").

Distribution model: queries are the parallel unit. Query terms join to their
posting segments (inner join == the inverted-index probe J1, pruning to
touched terms only), then ``groupBy(query_id).applyInPandas`` runs the
document-at-a-time WAND loop per query with

- lazy block decode (a block's 3 varbyte streams are only decoded when the
  cursor actually lands in it),
- global and block-level upper bounds ub = idf * max_q (safe because
  variant-1 idf >= 0, SURVEY §2.9),
- a bounded min-heap of k candidates keyed (score, -doc_ord) so equal scores
  keep the smaller ordinal == smaller docid — the engine tie rule,
- the classic pivot/seek loop with the BMW shallow-skip refinement.

This is the pruned twin of query/bm25.py's exhaustive scorer; tests assert
they (and the NumPy oracle) agree rank-identically. At 2k reference queries
the per-query groups are small and uniform — the WAND shuffle moves only the
COMPRESSED segments each query touches.

Scale note: a single query with a very hot term still gathers that term's
segments to one task; block-max lets it skip most decode work, and the
segment rows cap memory per row. For single-query latency at extreme df the
doc-partitioned variant (score per doc-range, merge top-k) is the documented
alternative (README); the reference workload (2k queries, Kaggle batch) maps
to this per-query layout.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import BM25Config
from .bm25 import bm25_term_score  # noqa: F401  (doc parity reference)
from ..operators.codec import delta_decode, vb_decode

_EMPTY_I64 = np.empty(0, dtype=np.int64)
_EMPTY_F64 = np.empty(0, dtype=np.float64)


class _Cursor:
    """Iterates one term's posting segments block-by-block with lazy decode."""

    __slots__ = (
        "idf", "k1", "one_minus_b", "b_over", "avgdl", "segs", "seg_i",
        "blk_i", "ords", "tfs", "dls", "pos", "done", "ub", "order_key", "hi",
    )

    def __init__(
        self,
        idf: float,
        segs: list[dict],
        bm25: BM25Config,
        avgdl: float,
        order_key: int = 0,
        lo: int | None = None,
        hi: int | None = None,
    ):
        # order_key fixes the per-doc float summation order (ascending term
        # order) so scores are bit-reproducible run to run — last-ulp sum
        # differences would otherwise swap equal-score ties (SURVEY §7 risks).
        self.order_key = order_key
        # segs: [{first_ord, last_ord, max_q, blocks:[{base,last,n,max_q,docs,tfs,dls}]}]
        self.idf = idf
        self.k1 = bm25.k1
        self.avgdl = avgdl
        if bm25.length_norm == "standard":
            self.one_minus_b = 1.0 - bm25.b
            self.b_over = bm25.b / avgdl
        else:
            self.one_minus_b = 1.0 - bm25.b
            self.b_over = 1.0 / avgdl
        self.segs = sorted(segs, key=lambda s: s["first_ord"])
        self.seg_i = 0
        self.blk_i = 0
        self.pos = 0
        self.done = not self.segs
        self.ub = idf * max((s["max_q"] for s in self.segs), default=0.0)
        # [lo, hi) doc-ordinal clamp for the doc-partitioned layout: the
        # cursor scores only its bucket's range even when a (non-hot)
        # segment spans several buckets
        self.hi = hi
        if not self.done:
            self._load_block()
            if lo is not None:
                self.seek(lo)
            else:
                self._clamp()

    def _cur_blocks(self):
        return self.segs[self.seg_i]["blocks"]

    def _load_block(self):
        b = self._cur_blocks()[self.blk_i]
        self.ords = delta_decode(bytes(b["docs"]))
        self.tfs = vb_decode(bytes(b["tfs"])).astype(np.float64)
        self.dls = vb_decode(bytes(b["dls"])).astype(np.float64)
        self.pos = 0

    def cur_doc(self) -> int:
        return int(self.ords[self.pos])

    def cur_block_last(self) -> int:
        return int(self._cur_blocks()[self.blk_i]["last"])

    def cur_block_ub(self) -> float:
        return self.idf * float(self._cur_blocks()[self.blk_i]["max_q"])

    def cur_score(self) -> float:
        tf = self.tfs[self.pos]
        dl = self.dls[self.pos]
        denom = tf + self.k1 * (self.one_minus_b + dl * self.b_over)
        # quotient FIRST, then * idf: the encoder stores per-block maxima of
        # this exact quotient expression (operators/postings.py _quotient_np),
        # and multiplying by a positive idf is monotone — so block/segment
        # upper bounds can never be a final-ulp below an actual score
        return self.idf * (tf * (self.k1 + 1.0) / denom)

    def _clamp(self):
        if not self.done and self.hi is not None and self.cur_doc() >= self.hi:
            self.done = True

    def advance(self):
        self.pos += 1
        if self.pos < self.ords.size:
            self._clamp()
            return
        self.blk_i += 1
        if self.blk_i < len(self._cur_blocks()):
            self._load_block()
            self._clamp()
            return
        self.seg_i += 1
        self.blk_i = 0
        if self.seg_i < len(self.segs):
            self._load_block()
            self._clamp()
        else:
            self.done = True

    def _bulk_decode(self, i: int, j: int):
        """Decode blocks [i, j) of the current segment with ONE varbyte
        decode per stream (vs three numpy-heavy decodes per 128-posting
        block — the kernel's measured hot spot). Varbyte streams
        concatenate cleanly; each block's first doc value is stored
        ABSOLUTE, so the chained cumsum is fixed with one segmented
        correction (exact int64 arithmetic — decoded ordinals are
        bit-identical to per-block delta_decode)."""
        bl = self._cur_blocks()[i:j]
        gaps = vb_decode(b"".join(bytes(b["docs"]) for b in bl)).astype(
            np.int64
        )
        ords = np.cumsum(gaps)
        if len(bl) > 1:
            ns = np.array([b["n"] for b in bl], dtype=np.int64)
            starts = np.zeros(len(bl), dtype=np.int64)
            np.cumsum(ns[:-1], out=starts[1:])
            # carry accumulated INTO each block's first element; the first
            # block's carry is 0 by construction
            corr = ords[starts] - gaps[starts]
            ords -= np.repeat(corr, ns)
        tfs = vb_decode(b"".join(bytes(b["tfs"]) for b in bl)).astype(
            np.float64
        )
        dls = vb_decode(b"".join(bytes(b["dls"]) for b in bl)).astype(
            np.float64
        )
        return ords, tfs, dls

    def take_upto(self, end: int) -> tuple[np.ndarray, np.ndarray]:
        """Gather (doc_ords, scores) for every posting with
        cur_doc <= doc_ord <= end and advance past them — the vectorized
        batch twin of cur_score()+advance(). Score arithmetic is the exact
        elementwise expression of cur_score() (quotient first, then * idf)
        in the same float64 ops, so batch scores are bit-identical to the
        per-doc path. Runs of WHOLE blocks within the consumed range are
        decoded in one segmented shot (_bulk_decode); partially consumed
        blocks keep the per-block path, and blocks a seek skips are still
        never decoded."""
        out_o: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        while not self.done and self.cur_doc() <= end:
            j = int(np.searchsorted(self.ords, end, "right"))
            clamped = False
            if self.hi is not None:
                jh = int(np.searchsorted(self.ords, self.hi, "left"))
                # jh < size means the clamp cuts INSIDE this block; jh ==
                # size just means every element here is < hi
                if jh < self.ords.size and jh <= j:
                    j, clamped = jh, True
            if j > self.pos:
                tf = self.tfs[self.pos : j]
                dl = self.dls[self.pos : j]
                denom = tf + self.k1 * (self.one_minus_b + dl * self.b_over)
                out_o.append(self.ords[self.pos : j])
                out_s.append(self.idf * (tf * (self.k1 + 1.0) / denom))
            if clamped:
                self.done = True
                break
            if j < self.ords.size:
                self.pos = j
                self._clamp()
                break
            # consumed the whole loaded block — bulk-consume the following
            # run of blocks that fit entirely inside [.., end] and below
            # the hi clamp, then enter the first block past the run
            blocks = self._cur_blocks()
            nb = len(blocks)
            k = self.blk_i + 1
            lim = end if self.hi is None else min(end, self.hi - 1)
            while k < nb and blocks[k]["last"] <= lim:
                k += 1
            if k > self.blk_i + 1:
                ords, tf, dl = self._bulk_decode(self.blk_i + 1, k)
                denom = tf + self.k1 * (self.one_minus_b + dl * self.b_over)
                out_o.append(ords)
                out_s.append(self.idf * (tf * (self.k1 + 1.0) / denom))
            self.blk_i = k
            if self.blk_i >= nb:
                self.seg_i += 1
                self.blk_i = 0
                if self.seg_i >= len(self.segs):
                    self.done = True
                    break
            self._load_block()
            self._clamp()
        if not out_o:
            return _EMPTY_I64, _EMPTY_F64
        if len(out_o) == 1:
            return out_o[0], out_s[0]
        return np.concatenate(out_o), np.concatenate(out_s)

    def block_last_ahead(self, w: int) -> int:
        """last doc ordinal of the block (w-1) ahead of the current one in
        this segment (clamped to the segment's final block) — the strip
        boundary for a w-block-wide strip. w=1 == cur_block_last()."""
        blocks = self._cur_blocks()
        return int(blocks[min(self.blk_i + w - 1, len(blocks) - 1)]["last"])

    def block_ub_ahead(self, w: int) -> float:
        """idf * max block quotient over the current and next (w-1) blocks
        — a valid upper bound for any posting this cursor contributes to a
        strip that ends at or before block_last_ahead(w). w=1 ==
        cur_block_ub(). Metadata only; decodes nothing."""
        m = 0.0
        for b in self._cur_blocks()[self.blk_i : self.blk_i + w]:
            q = b["max_q"]
            if q > m:
                m = q
        return self.idf * m

    def seek(self, target: int):
        """Advance to the first posting with doc_ord >= target."""
        if self.done:
            return
        # skip whole segments via metadata only — decode nothing until the
        # landing block is known (a hot term may span thousands of segments)
        moved = False
        while self.seg_i < len(self.segs) and self.segs[self.seg_i]["last_ord"] < target:
            self.seg_i += 1
            self.blk_i = 0
            moved = True
        if self.seg_i >= len(self.segs):
            self.done = True
            return
        # skip blocks via metadata (no decode)
        blocks = self._cur_blocks()
        while self.blk_i < len(blocks) and blocks[self.blk_i]["last"] < target:
            self.blk_i += 1
            moved = True
        if self.blk_i >= len(blocks):  # can't happen: seg last_ord >= target
            self.done = True
            return
        if moved:
            self._load_block()
        # the metadata skips above guarantee the loaded block's last >= target,
        # so the landing position exists in this block (any target, including
        # an arbitrary bucket lower bound)
        self.pos = int(np.searchsorted(self.ords[self.pos :], target, "left")) + self.pos
        self._clamp()


def _wand_one_query(cursors: list[_Cursor], k: int) -> list[tuple[int, float]]:
    """Classic WAND with block-max shallow skips; returns [(doc_ord, score)]
    ranked by (score desc, doc_ord asc)."""
    heap: list[tuple[float, int]] = []  # (score, -doc_ord) min-heap

    def theta() -> float:
        return heap[0][0] if len(heap) >= k else float("-inf")

    alive = [c for c in cursors if not c.done]
    while alive:
        alive.sort(key=lambda c: c.cur_doc())
        th = theta()
        acc = 0.0
        pivot = -1
        for i, c in enumerate(alive):
            acc += c.ub
            if acc > th:
                pivot = i
                break
        if pivot < 0:
            break  # no remaining doc can beat theta
        pivot_doc = alive[pivot].cur_doc()
        if alive[0].cur_doc() == pivot_doc:
            # all cursors 0..pivot sit on pivot_doc (sorted); block-max check
            matching = [c for c in alive if not c.done and c.cur_doc() == pivot_doc]
            block_ub = sum(c.cur_block_ub() for c in matching)
            if block_ub <= th:
                # shallow skip: no doc until the nearest block end can win
                d_skip = min(c.cur_block_last() for c in matching) + 1
                nxt = [c.cur_doc() for c in alive if c.cur_doc() > pivot_doc]
                if nxt:
                    d_skip = min(d_skip, min(nxt))
                d_skip = max(d_skip, pivot_doc + 1)
                for c in matching:
                    c.seek(d_skip)
            else:
                score = sum(
                    c.cur_score()
                    for c in sorted(matching, key=lambda c: c.order_key)
                )
                if score > th or (len(heap) < k):
                    item = (score, -pivot_doc)
                    if len(heap) < k:
                        heapq.heappush(heap, item)
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)
                for c in matching:
                    c.advance()
        else:
            # advance the highest-ub cursor among those strictly BEFORE the
            # pivot doc (index-before is not enough: an earlier cursor may
            # already sit on pivot_doc, and seeking it would not move)
            pre = [c for c in alive[:pivot] if c.cur_doc() < pivot_doc]
            chosen = max(pre, key=lambda c: c.ub)
            chosen.seek(pivot_doc)
        alive = [c for c in alive if not c.done]

    out = sorted(((s, -nd) for s, nd in heap), key=lambda x: (-x[0], x[1]))
    return [(d, s) for s, d in out]


def _wand_one_query_blocked(
    cursors: list[_Cursor], k: int
) -> list[tuple[int, float]]:
    """STRIP-at-a-time block-max WAND — the vectorized twin of
    `_wand_one_query` (same exact top-k, same tie rule, bit-identical
    scores; tests assert result equality between the two kernels).

    The per-doc kernel spends O(union-size) Python iterations per query
    (sort + list rebuilds per pivot doc). Here the doc-ordinal axis is
    processed in STRIPS bounded by the nearest w-blocks-ahead end across
    alive cursors (w adapts: doubling after scored strips up to 8, reset
    to 1 on a skip — dense regions bulk-decode, prunable regions keep
    single-block skip granularity): a strip whose summed w-block-max upper
    bound can't beat theta is skipped whole (at w=1 exactly BMW's shallow
    skip boundary), and a surviving strip is gathered and scored as NumPy
    arrays (`_Cursor.take_upto`, with runs of whole blocks decoded in one
    segmented varbyte pass), hundreds to thousands of postings per
    interpreter iteration instead of one.

    Exactness: every doc in strip [d, strip_end] can only carry terms whose
    cursors currently overlap the strip (cur_doc <= strip_end), so their
    summed current-block maxima upper-bound any doc score in the strip.
    Scores accumulate via np.add.at over cursors concatenated in ascending
    order_key — np.ufunc.at applies updates in index order, so each doc's
    float summation order is exactly the per-doc kernel's sorted-term
    order.

    Top-k bookkeeping is BUFFERED, not a per-doc heap: surviving strip
    candidates above the current theta append to a numpy buffer; when the
    buffer exceeds ~max(4k, 1024) entries it compresses to the exact top-k
    via one lexsort on (-score, doc_ord) and theta jumps to the k-th best.
    Theta is therefore slightly STALE between compressions — a lower bound
    of the heap kernel's exact theta — so strips prune no more (never
    less correct) than the per-doc kernel, and the final lexsort selection
    applies the identical (score desc, doc_ord asc) tie rule. Exact, with
    zero per-document interpreter work."""
    cand_o: list[np.ndarray] = []
    cand_s: list[np.ndarray] = []
    n_cand = 0
    theta = float("-inf")
    compress_at = max(4 * k, 1024)

    def compress() -> None:
        nonlocal n_cand, theta
        o = cand_o[0] if len(cand_o) == 1 else np.concatenate(cand_o)
        s = cand_s[0] if len(cand_s) == 1 else np.concatenate(cand_s)
        if o.size > k:
            sel = np.lexsort((o, -s))[:k]
            o, s = o[sel], s[sel]
        cand_o[:] = [o]
        cand_s[:] = [s]
        n_cand = int(o.size)
        if n_cand >= k and n_cand:
            theta = float(s.min())

    # ADAPTIVE strip width: a strip is bounded by the nearest w-blocks-ahead
    # end across alive cursors. Width doubles (cap 8) after every SCORED
    # strip and resets to 1 on a skip: dense regions where pruning isn't
    # firing anyway get consumed in multi-block strips (one segmented
    # varbyte decode per stream instead of three numpy decodes per
    # 128-posting block — the kernel's measured hot spot), while prunable
    # regions keep single-block skip granularity. Exactness is unchanged:
    # scored strips only ever widen the candidate superset (the final
    # compress applies the exact tie rule), and a skipped strip uses the
    # valid w-block max bound.
    w = 1
    alive = [c for c in cursors if not c.done]
    while alive:
        total_ub = 0.0
        for c in alive:
            total_ub += c.ub
        if total_ub <= theta:
            break  # no remaining doc anywhere can beat theta
        strip_end = min(c.block_last_ahead(w) for c in alive)
        overlapping = [c for c in alive if c.cur_doc() <= strip_end]
        strip_ub = 0.0
        for c in overlapping:
            strip_ub += c.block_ub_ahead(w)
        if strip_ub <= theta:
            # BMW shallow skip, strip-wide: metadata-only seek past the
            # strip (seek decodes only the landing block)
            for c in overlapping:
                c.seek(strip_end + 1)
            w = 1
        else:
            overlapping.sort(key=lambda c: c.order_key)
            parts_o: list[np.ndarray] = []
            parts_s: list[np.ndarray] = []
            for c in overlapping:
                o, s = c.take_upto(strip_end)
                if o.size:
                    parts_o.append(o)
                    parts_s.append(s)
            if parts_o:
                cat_o = parts_o[0] if len(parts_o) == 1 else np.concatenate(parts_o)
                cat_s = parts_s[0] if len(parts_s) == 1 else np.concatenate(parts_s)
                uniq, inv = np.unique(cat_o, return_inverse=True)
                acc = np.zeros(uniq.size, dtype=np.float64)
                np.add.at(acc, inv, cat_s)
                keep = acc > theta
                nkeep = int(np.count_nonzero(keep))
                if nkeep:
                    cand_o.append(uniq[keep])
                    cand_s.append(acc[keep])
                    n_cand += nkeep
                    if n_cand >= compress_at:
                        compress()
            w = min(w * 2, 8)
        alive = [c for c in alive if not c.done]
    if not cand_o:
        return []
    compress()  # final exact top-k, already in (score desc, doc asc) order
    o, s = cand_o[0], cand_s[0]
    if o.size <= k:
        # buffers under k entries skip the in-loop sort; order them now
        sel = np.lexsort((o, -s))
        o, s = o[sel], s[sel]
    return list(zip(o.tolist(), s.tolist()))


import os as _os

# kernel selector: blocked (vectorized strips) is the default; the per-doc
# kernel stays available for A/B and as the executable spec
_WAND_KERNEL = (
    _wand_one_query
    if _os.environ.get("SPARK_GRAFT_WAND_KERNEL", "blocked") == "perdoc"
    else _wand_one_query_blocked
)


def wand_topk(
    query_terms: DataFrame,   # (query_id, term[, lang])
    postings: DataFrame,      # encoded segments from build_postings
    doc_map: DataFrame,       # (docid, doc_ord)
    coll: DataFrame,          # (n_docs, avgdl) — one row, or per lang
    bm25: BM25Config,
    k: int = 10,
    lang_col: str | None = None,
    terms: list[str] | None = None,
    max_pushdown_terms: int = 50_000,
    n_query_parts: int | None = None,
    term_dict: DataFrame | None = None,
    avgdl: float | None = None,
) -> DataFrame:
    """-> (query_id, rank, docid, score).

    With lang_col set, postings/coll are per-language models and queries are
    routed to their language (P2/P3 — `final_implementation.py:320-326`);
    each query's cursors score with that language's avgdl.

    `terms`: optional pre-known distinct term list of the batch (callers that
    hold the query set locally — e.g. scripts/query.py reading a CSV — pass
    it, avoiding any driver-side collect here).
    """
    touched = _touched_segments(
        query_terms, postings, coll, bm25, lang_col, terms,
        max_pushdown_terms, term_dict, avgdl
    )

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["query_id"].iloc[0]
        avgdl = float(pdf["_avgdl"].iloc[0])  # one lang (hence avgdl) per query
        ranked = _WAND_KERNEL(_cursors_from_pdf(pdf, bm25, avgdl), k)
        return pd.DataFrame(
            {
                "query_id": qid,
                "rank": np.arange(1, len(ranked) + 1, dtype=np.int32),
                "doc_ord": [d for d, _ in ranked],
                "score": [s for _, s in ranked],
            }
        )

    # Finer-than-default query partitioning: per-query WAND cost is skewed
    # (a hot-term query touches ~3x the median's postings), and with only
    # spark.sql.shuffle.partitions buckets the slowest bucket gates the
    # stage. HashPartitioning on query_id satisfies the groupBy's required
    # distribution, so this is ONE shuffle, just finer-grained — tasks pack
    # onto cores as they free up. The default (8x defaultParallelism) is
    # tuned for at-scale batches where per-task kernel work dwarfs the
    # ~25 ms per-task Arrow/launch overhead (measured +12% on a 1M-turn
    # batch, WAND phase 2->8-core speedup 2.4x -> 4.0x); for SMALL corpora
    # the overhead dominates — pass n_query_parts ~ 2x parallelism there
    # (measured: 129k-turn batch 4.8-6.2 s at 8x vs 3.8-3.9 s at 2x).
    if n_query_parts is not None:
        parted = touched.repartition(n_query_parts, "query_id")
    elif terms is not None and len(terms) <= 64:
        # SMALL batch (driver knows the term list — typically one query):
        # the kernel work is a handful of segments, so scheduling dominates;
        # a number-pinned repartition would launch par*8 mostly-EMPTY tasks
        # per call (~hundreds of ms of pure task-launch on a 1-query
        # latency path). A column-only repartition is an AQE coalesce
        # target, so the exchange sizes itself to the actual bytes —
        # one task for one query, which is exactly this layout's latency
        # model (one core runs the whole query).
        parted = touched.repartition("query_id")
    else:
        parted = touched.repartition(
            touched.sparkSession.sparkContext.defaultParallelism * 8,
            "query_id",
        )
    res = parted.groupBy("query_id").applyInPandas(
        score_group, schema="query_id string, rank int, doc_ord long, score double"
    )
    # map doc_ord -> docid by BROADCASTING THE CANDIDATES (<= k rows per
    # query) against doc_map — never the reverse: doc_map is corpus-sized
    # (10^12 rows at target), and without the hint a single query pays a
    # full doc_map shuffle in a sort-merge join
    return doc_map.select("docid", "doc_ord").join(
        F.broadcast(res), "doc_ord"
    ).select("query_id", "rank", "docid", "score")


def _cursors_from_pdf(pdf: pd.DataFrame, bm25: BM25Config, avgdl: float,
                      lo: int | None = None, hi: int | None = None) -> list:
    """One _Cursor per term of a single query's touched-segment rows.

    sort=True: ascending term order == the oracle's sorted(set(query))
    summation order — bit-identical per-doc scores."""
    cursors = []
    for ti, (term, grp) in enumerate(pdf.groupby("term", sort=True)):
        idf = float(grp["idf"].iloc[0])
        if idf < 0.0:
            # data-driven guard: an index persisted with idf_plus_one=False
            # (BM25 variants 3/5) carries negative idf for df > N/2 terms;
            # ub = idf*max_q would then be a LOWER bound and the pivot/
            # block-max pruning silently drops true top-k members
            raise ValueError(
                f"negative idf ({idf}) for term {term!r}: WAND's block-max "
                "upper bounds require idf >= 0 — variant-3/5 indexes must "
                "be scored with the exhaustive join scorer"
            )
        segs = [
            {
                "first_ord": int(r.first_ord),
                "last_ord": int(r.last_ord),
                "max_q": float(r.max_q),
                "blocks": list(r.blocks),
            }
            for r in grp.itertuples()
        ]
        cursors.append(_Cursor(idf, segs, bm25, avgdl, order_key=ti,
                               lo=lo, hi=hi))
    return cursors


def _touched_segments(
    query_terms: DataFrame,
    postings: DataFrame,
    coll: DataFrame,
    bm25: BM25Config,
    lang_col: str | None,
    terms: list[str] | None,
    max_pushdown_terms: int,
    term_dict: DataFrame | None = None,
    avgdl: float | None = None,
) -> DataFrame:
    """Shared probe stage of both WAND layouts: validate the config, prune
    the postings scan to the batch's touched terms, join query terms to
    their segments and attach each query's avgdl.

    `term_dict` ((term[, lang], term_id)): when the index was built in
    dictionary mode its postings persist int64 term_id alongside the
    string — mapping the query batch through the (broadcast) dictionary
    lets the scan prune with `In(term_id, ...)` instead of a string IN:
    int64 parquet column stats/dictionaries are cheaper to evaluate and
    prune better at 10^8-term vocabularies, and the segments join keys on
    a long instead of a string."""
    join_keys = ["term"] + ([lang_col] if lang_col else [])
    if not bm25.unique_query_terms:
        # duplicate-term scoring (variants 2-5's literal loops) would count
        # a term once here but twice in the exhaustive scorer — refuse
        # rather than silently disagree with the differential twin
        raise ValueError(
            "wand_topk scores each distinct query term once "
            "(unique_query_terms=False configs must use "
            "bm25_score_exhaustive)"
        )
    # The WAND kernel requires DISTINCT per-query terms: duplicate
    # (query_id, term) rows would duplicate a term's segments inside one
    # cursor and break the sorted-cursor invariant (doc ordinals must be
    # strictly increasing within a cursor).
    if terms is not None and len(terms) <= 64:
        # small batch (driver knows the term list — typically one query):
        # a query DF born from createDataFrame is a parallelize RDD with
        # defaultParallelism slices, so every evaluation launches that many
        # Python tasks for a handful of rows (~190 ms of pure task launch
        # per latency-path call, measured r6); fold it to one task first
        query_terms = query_terms.coalesce(1)
    query_terms = query_terms.dropDuplicates(["query_id", *join_keys])
    if term_dict is not None and "term_id" in postings.columns:
        # ID-PUSHDOWN PATH (dict-mode index): translate the batch through
        # the broadcast dictionary (inner join == the OOV-drop semantics
        # the string path gets from its inner segments join), push the
        # bounded int64 IN below the scan, and probe the segments on the
        # long key. The string `term` column rides along from the query
        # side for the output contract.
        dict_cols = [*join_keys, "term_id"]
        qt_id = query_terms.join(
            F.broadcast(term_dict.select(*dict_cols)), join_keys
        )
        ids = [
            r["term_id"]
            for r in qt_id.select("term_id")
            .distinct()
            .limit(max_pushdown_terms + 1)
            .collect()
        ]
        if len(ids) <= max_pushdown_terms:
            postings = postings.filter(F.col("term_id").isin(ids))
        else:
            postings = postings.join(
                F.broadcast(qt_id.select("term_id").distinct()),
                "term_id", "leftsemi",
            )
        id_keys = ["term_id"] + ([lang_col] if lang_col else [])
        touched = postings.drop("term").join(F.broadcast(qt_id), id_keys)
        if lang_col:
            touched = touched.join(
                F.broadcast(coll.select(lang_col, "avgdl")), lang_col
            )
            avgdl_col = F.col("avgdl")
        else:
            if avgdl is None:
                avgdl = float(coll.select("avgdl").first()["avgdl"])
            avgdl_col = F.lit(float(avgdl))
        return touched.select(
            "query_id", "term", "idf", "first_ord", "last_ord", "max_q",
            "blocks", avgdl_col.alias("_avgdl"),
        )
    # Explicit IN-filter on the touched terms BEFORE the join: against a
    # persisted index this becomes a parquet PushedFilter (only touched
    # shards/row-groups are read — the "load only that language's model"
    # routing of `final_implementation.py:320-326`, generalized to terms).
    # The distinct term list of a query batch is small by construction
    # (2k queries x <=6 terms); the driver collect is bounded by limit().
    if terms is None:
        terms = [
            r["term"]
            for r in query_terms.select("term")
            .distinct()
            .limit(max_pushdown_terms + 1)
            .collect()
        ]
    if len(terms) <= max_pushdown_terms:
        postings = postings.filter(F.col("term").isin(list(terms)))
    else:
        # huge batch: broadcast semi-join prune instead of a 50k-literal IN
        # (no parquet pushdown, but still reads/joins only touched terms)
        postings = postings.join(
            F.broadcast(query_terms.select("term").distinct()), "term", "leftsemi"
        )
    touched = postings.join(F.broadcast(query_terms), join_keys)
    if lang_col:
        touched = touched.join(
            F.broadcast(coll.select(lang_col, "avgdl")), lang_col
        )
        avgdl_col = F.col("avgdl")
    else:
        # callers that already hold the collection stats pass the scalar —
        # one fewer driver job of fixed floor per batch
        if avgdl is None:
            avgdl = float(coll.select("avgdl").first()["avgdl"])
        avgdl_col = F.lit(float(avgdl))
    return touched.select(
        "query_id", "term", "idf", "first_ord", "last_ord", "max_q", "blocks",
        avgdl_col.alias("_avgdl"),
    )


def wand_topk_docpart(
    query_terms: DataFrame,   # (query_id, term)
    postings: DataFrame,      # encoded segments from build_postings
    doc_map: DataFrame,       # (docid, doc_ord)
    coll: DataFrame,          # (n_docs, avgdl) — one row (global model)
    bm25: BM25Config,
    k: int = 10,
    n_buckets: int | None = None,
    terms: list[str] | None = None,
    max_pushdown_terms: int = 50_000,
    n_docs: int | None = None,
    term_dict: DataFrame | None = None,
    avgdl: float | None = None,
) -> DataFrame:
    """DOC-PARTITIONED block-max WAND -> (query_id, rank, docid, score),
    rank-identical to `wand_topk` (tests assert exact equality).

    The per-query layout above parallelizes ACROSS queries: a single query
    runs in one task, so single-query latency is one core's WAND pass. Here
    the doc-ordinal space splits into `n_buckets` ranges; every (query,
    bucket) pair scores independently (a doc's postings for ALL terms live
    in its bucket — hot-term segments are doc-range-disjoint by the salting
    construction, and a spanning non-hot segment is replicated to each
    bucket it overlaps with the cursor clamped to [lo, hi)), then a global
    top-k merges the <= k*n_buckets candidates. Exact because doc ranges are
    disjoint: each doc's score is computed whole, in exactly one bucket.

    The trade: block-max pruning loses the shared theta across buckets and
    spanning segments ship to several tasks — so this layout is for LATENCY
    (one fat query on an idle cluster), not batch throughput. The reference
    has no single-query path at all (one full NumPy pass per query,
    `bm25_ranking.ipynb cell 7`).

    `avgdl`, like `n_docs` and `terms`, is a serving-layer floor cut, not
    an override: a caller that already holds the collection stats passes
    the scalar and saves the one-row driver job per query. It MUST equal
    the index's avgdl (scripts/query.py guards user overrides; this
    parameter is for pass-through of the true value)."""
    from ..operators.topk import topk_per_group

    extra = [c for c in coll.columns if c not in ("n_docs", "avgdl")]
    if extra:
        raise ValueError(
            "wand_topk_docpart requires the single-row global collection "
            f"model; coll carries partition column(s) {extra} — use "
            "wand_topk with lang_col for a language-partitioned index"
        )
    touched = _touched_segments(
        query_terms, postings, coll, bm25, None, terms, max_pushdown_terms,
        term_dict, avgdl
    )
    spark = touched.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism * 2
    if n_docs is None:  # latency-sensitive callers pass it to skip the job
        rows = coll.select("n_docs").collect()
        if len(rows) != 1:
            raise ValueError(
                "wand_topk_docpart routes on GLOBAL doc ordinals and a "
                f"single collection model; coll has {len(rows)} rows (a "
                "language-partitioned stats table) — use wand_topk with "
                "lang_col instead"
            )
        n_docs = int(rows[0]["n_docs"])
    width = max(1, -(-n_docs // n_buckets))
    # exact INTEGER division for bucket ids: float `/` then floor is exact
    # today but a half-ulp rounding near a bucket boundary at 10^12 doc
    # ordinals would route a segment to the wrong bucket range and its
    # boundary docs would never be scored; `div` is also cheaper.
    buckets = touched.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"first_ord div {width}").cast("int"),
                F.expr(f"last_ord div {width}").cast("int"),
            )
        ),
    )
    # Prune each replica's block list to its bucket's [lo, hi) BEFORE the
    # (query_id, bucket) shuffle: without this, a spanning segment ships
    # its FULL encoded payload to every overlapped bucket (xN_buckets
    # bytes — measured dominating single-query latency at 4M turns). A
    # block's (base, last) bound its doc ordinals, so dropping
    # non-overlapping blocks cannot change any bucket's scores; the
    # segment-level max_q stays a valid (looser) upper bound. Replicated
    # bytes fall from ~touched x n_buckets to ~touched.
    blo = F.col("bucket").cast("long") * F.lit(width)
    bhi = blo + F.lit(width)
    buckets = buckets.withColumn(
        "blocks",
        F.filter(
            F.col("blocks"),
            lambda b: (b["last"] >= blo) & (b["base"] < bhi),
        ),
    ).filter(F.size("blocks") > 0)

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["query_id"].iloc[0]
        b = int(pdf["bucket"].iloc[0])
        avgdl = float(pdf["_avgdl"].iloc[0])
        lo, hi = b * width, (b + 1) * width
        ranked = _WAND_KERNEL(
            _cursors_from_pdf(pdf, bm25, avgdl, lo=lo, hi=hi), k
        )
        return pd.DataFrame(
            {
                "query_id": qid,
                "doc_ord": [d for d, _ in ranked],
                "score": [s for _, s in ranked],
            }
        )

    cand = buckets.groupBy("query_id", "bucket").applyInPandas(
        score_bucket, schema="query_id string, doc_ord long, score double"
    )
    # global merge: k winners among <= k*n_buckets candidates, engine tie
    # rule (score desc, doc_ord asc == docid asc)
    ranked = topk_per_group(cand, ["query_id"], "score", "doc_ord", k)
    # candidates (<= k*n_buckets rows) broadcast against corpus-sized
    # doc_map — same rationale as wand_topk's final map-back
    return doc_map.select("docid", "doc_ord").join(
        F.broadcast(ranked), "doc_ord"
    ).select("query_id", "rank", "docid", "score")
