#!/usr/bin/env python3
"""Extend the docpart latency crossover one doubling: 8 single-query
probes per layout at ~4.16M turns (640k conversations), local[16]."""
import json, math, sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from document_retrieval_spark.session import get_spark
from document_retrieval_spark.config import REFERENCE_PROFILE, BM25Config
from document_retrieval_spark.oracle.bm25 import oracle_tokenize
from document_retrieval_spark.query import prepare_query_terms
from document_retrieval_spark.query.wand import wand_topk, wand_topk_docpart

N_CONV = 640_000
tr_pdf, q_pdf = bench._mk_corpus(N_CONV)
spark = get_spark("x4m", master="local[16]", shuffle_partitions=32,
                  extra_conf=dict(bench._BENCH_CONF))
bm25 = BM25Config()
t0 = time.time()
b, q, docs_ord, coll, postings, stats, tf = bench._build_and_query(
    spark, tr_pdf, q_pdf)
print(f"build+batch {time.time()-t0:.0f}s turns={len(tr_pdf)}", flush=True)
n_docs = int(docs_ord.count())

def probe(fn):
    lat = []
    for _, row in q_pdf.head(8).iterrows():
        q1 = spark.createDataFrame([(row["query_id"], row["query"])],
                                   ["query_id", "query"])
        qt1 = prepare_query_terms(q1, REFERENCE_PROFILE, bm25)
        terms1 = sorted(set(oracle_tokenize(row["query"], REFERENCE_PROFILE)))
        t = time.time()
        fn(qt1, terms1).count()
        lat.append(round((time.time() - t) * 1000))
    return sorted(lat)

per_q = probe(lambda qt1, t1: wand_topk(qt1, postings, docs_ord, coll, bm25,
                                        k=10, terms=t1))
dp = probe(lambda qt1, t1: wand_topk_docpart(qt1, postings, docs_ord, coll,
                                             bm25, k=10, terms=t1,
                                             n_docs=n_docs))
print(json.dumps({"turns": len(tr_pdf), "per_query_ms": per_q,
                  "docpart_ms": dp}))
spark.stop()
