#!/usr/bin/env python3
"""Extend the docpart latency crossover another doubling-plus: single-query
probes per layout at ~10.4M turns (1.6M conversations), local[16]
(r4 brief stretch task 7). Records p50/p95 per layout and the docpart
bucket auto-choice at this scale.

    python tools/crossover_10m.py [n_conv]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from document_retrieval_spark.config import REFERENCE_PROFILE, BM25Config
from document_retrieval_spark.oracle.bm25 import oracle_tokenize
from document_retrieval_spark.query import prepare_query_terms
from document_retrieval_spark.query.wand import wand_topk, wand_topk_docpart
from document_retrieval_spark.session import get_spark

N_CONV = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
tr_pdf, q_pdf = bench._mk_corpus(N_CONV)
spark = get_spark("x10m", master="local[16]", shuffle_partitions=64,
                  extra_conf=dict(bench._BENCH_CONF))
bm25 = BM25Config()
t0 = time.time()
b, q, docs_ord, coll, postings, stats, tf = bench._build_and_query(
    spark, tr_pdf, q_pdf)
print(f"build {b:.0f}s batch {q:.0f}s turns={len(tr_pdf)}", flush=True)
n_docs = int(docs_ord.count())
n_buckets = spark.sparkContext.defaultParallelism * 2
width = max(1, -(-n_docs // n_buckets))


def probe(fn, n=12):
    lat = []
    for _, row in q_pdf.head(n).iterrows():
        q1 = spark.createDataFrame([(row["query_id"], row["query"])],
                                   ["query_id", "query"])
        qt1 = prepare_query_terms(q1, REFERENCE_PROFILE, bm25)
        terms1 = sorted(set(oracle_tokenize(row["query"], REFERENCE_PROFILE)))
        t = time.time()
        fn(qt1, terms1).count()
        lat.append(round((time.time() - t) * 1000))
    s = sorted(lat)
    return {"p50": s[len(s) // 2], "p95": s[int(len(s) * 0.95) - 1],
            "max": s[-1], "all": s}


per_q = probe(lambda qt1, t1: wand_topk(qt1, postings, docs_ord, coll, bm25,
                                        k=10, terms=t1))
dp = probe(lambda qt1, t1: wand_topk_docpart(qt1, postings, docs_ord, coll,
                                             bm25, k=10, terms=t1,
                                             n_docs=n_docs))
print(json.dumps({
    "turns": len(tr_pdf), "n_docs": n_docs,
    "build_sec": round(b, 1), "batch_sec": round(q, 1),
    "docpart_buckets": n_buckets, "docpart_bucket_width": width,
    "per_query": per_q, "docpart": dp,
}))
spark.stop()
