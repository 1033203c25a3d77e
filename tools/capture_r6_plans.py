#!/usr/bin/env python3
"""Capture .explain("formatted") for every bench headline query path ->
plans/r06/<query>_<tag>.txt.   Usage: python tools/capture_r6_plans.py before
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MAIN_CORES = int(os.environ.get("BENCH_MAIN_CORES", "16"))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    import bench as bench_mod
    from document_retrieval_spark.session import get_spark

    tr_pdf, q_pdf = bench_mod._mk_corpus()
    spark = get_spark(
        "plans_r6", master=f"local[{MAIN_CORES}]",
        shuffle_partitions=max(MAIN_CORES * 2, 16),
        extra_conf=bench_mod._BENCH_CONF,
    )

    def dump(name: str, df) -> None:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}.txt")

    from pyspark.sql import functions as F

    from document_retrieval_spark.config import (
        REFERENCE_PROFILE,
        BM25Config,
        IndexConfig,
    )
    from document_retrieval_spark.operators.postings import (
        assign_doc_ordinals,
        build_postings,
    )
    from document_retrieval_spark.operators.stats import (
        build_term_stats,
        term_frequencies_from_turns,
    )
    from document_retrieval_spark.query import (
        bm25_score_exhaustive,
        cosine_topk,
        prepare_query_terms,
    )
    from document_retrieval_spark.query.cosine import doc_norms
    from document_retrieval_spark.query.wand import wand_topk

    bm25 = BM25Config()
    path = bench_mod._transcripts_parquet(tr_pdf)
    transcripts = spark.read.parquet(path)
    queries = spark.createDataFrame(q_pdf[["query_id", "query"]])

    tf = term_frequencies_from_turns(transcripts, REFERENCE_PROFILE).persist()
    dls = tf.groupBy("docid").agg(F.sum("tf").cast("int").alias("dl")).persist()
    docs_ord = assign_doc_ordinals(
        dls, approx_rows=int(tr_pdf["conv_id"].nunique())
    ).persist()
    coll = dls.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    ).persist()
    stats = build_term_stats(tf, coll).persist()
    avgdl = float(coll.first()["avgdl"])
    tf_ord = tf.join(docs_ord, "docid")
    postings = build_postings(
        tf_ord, stats, IndexConfig(n_shards=64, salt_df_threshold=2000,
                                   n_salts=8), bm25, avgdl_by_lang=avgdl,
    )
    dump("index_build", postings)
    postings = postings.persist()
    postings.count()

    qt = prepare_query_terms(queries, REFERENCE_PROFILE, bm25)
    from document_retrieval_spark.oracle.bm25 import oracle_tokenize

    batch_terms = sorted({
        t for q in q_pdf["query"] for t in oracle_tokenize(q, REFERENCE_PROFILE)
    })
    dump("bm25_wand", wand_topk(qt, postings, docs_ord, coll, bm25, k=10,
                                n_query_parts=32, terms=batch_terms,
                                avgdl=avgdl))
    dump("bm25_exhaustive", bm25_score_exhaustive(
        qt, tf, stats, docs_ord.select("docid", "dl"), bm25, k=10))
    dn = doc_norms(tf, stats)
    dump("cosine_norms_build", dn)
    dn = dn.persist()
    dn.count()
    dump("cosine_topk", cosine_topk(qt, tf, stats, k=10, doc_norm=dn))

    import __spark_entry__ as entry_mod

    for name in ("dedup_minhash_lsh", "ann_cosine_topk", "text_quality"):
        dump(name, entry_mod.queries()[name](spark, SF_DIR))

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
