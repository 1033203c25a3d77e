#!/usr/bin/env python3
"""Per-phase scaling profile of the bench scaling unit (build + WAND batch).

Runs the same phases as bench._build_and_query but forces each phase with an
action and times it, so N-vs-4N efficiency can be attributed per phase.

    taskset -c 0-1 python tools/profile_scaling.py 2 160000
    taskset -c 0-7 python tools/profile_scaling.py 8 160000

Prints one JSON line with per-phase seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    cores = int(sys.argv[1])
    n_conv = int(sys.argv[2]) if len(sys.argv) > 2 else 160000

    import bench
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
    from document_retrieval_spark.query import prepare_query_terms
    from document_retrieval_spark.query.wand import wand_topk
    from document_retrieval_spark.session import get_spark
    from pyspark.sql import functions as F

    tr_pdf, q_pdf = bench._mk_corpus(n_conv)
    conf = dict(bench._BENCH_CONF)
    extra = os.environ.get("PROFILE_EXTRA_CONF")
    if extra:
        conf.update(json.loads(extra))
    spark = get_spark(
        f"profile_{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 8), extra_conf=conf,
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    bm25 = BM25Config()
    path = bench._transcripts_parquet(tr_pdf)
    transcripts = spark.read.parquet(path)
    queries = spark.createDataFrame(q_pdf[["query_id", "query"]])

    use_dict = os.environ.get("SPARK_GRAFT_TERM_DICT", "0") != "0"
    use_conv = os.environ.get("SPARK_GRAFT_CONV_ORD", "0") != "0"
    ph: dict[str, float] = {}
    t_all = time.time()

    tdict = None
    if use_dict:
        from document_retrieval_spark.operators.stats import (
            build_term_dictionary,
        )

        t0 = time.time()
        tdict = build_term_dictionary(transcripts, REFERENCE_PROFILE).persist()
        tdict.count()
        ph["vocab"] = time.time() - t0

    conv_map = None
    if use_conv:
        from document_retrieval_spark.operators.stats import (
            assign_conv_ordinals,
        )

        t0 = time.time()
        conv_map = assign_conv_ordinals(
            transcripts, approx_rows=int(tr_pdf["conv_id"].nunique())
        ).persist()
        conv_map.count()
        ph["conv_map"] = time.time() - t0

    t0 = time.time()
    tf = term_frequencies_from_turns(
        transcripts, REFERENCE_PROFILE, term_dict=tdict, conv_map=conv_map
    ).persist()
    tf.count()
    ph["tf"] = time.time() - t0

    doc_key = "doc_ord" if use_conv else "docid"
    t0 = time.time()
    dls = tf.groupBy(doc_key).agg(
        F.sum("tf").cast("int").alias("dl")
    ).persist()
    if use_conv:
        docs_ord = conv_map.join(dls, "doc_ord").select(
            F.col("conv_id").alias("docid"), "doc_ord", "dl"
        ).persist()
    else:
        docs_ord = assign_doc_ordinals(
            dls, approx_rows=int(tr_pdf["conv_id"].nunique())
        ).persist()
    docs_ord.count()
    ph["ordinals"] = time.time() - t0

    t0 = time.time()
    coll = dls.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    ).persist()
    if use_dict:
        stats = (
            build_term_stats(tf, coll, term_col="term_id")
            .join(F.broadcast(tdict), "term_id")
            .persist()
        )
    else:
        stats = build_term_stats(tf, coll).persist()
    stats.count()
    ph["stats"] = time.time() - t0

    t0 = time.time()
    tf_ord = tf.join(dls, "doc_ord") if use_conv else tf.join(docs_ord, "docid")
    postings = build_postings(
        tf_ord, stats,
        IndexConfig(n_shards=64, salt_df_threshold=2000, n_salts=8), bm25,
    ).persist()
    n_post = postings.agg(F.sum("n_postings")).collect()[0][0]
    ph["postings"] = time.time() - t0

    t0 = time.time()
    qt = prepare_query_terms(queries, REFERENCE_PROFILE, bm25)
    from document_retrieval_spark.oracle.bm25 import oracle_tokenize

    batch_terms = sorted({
        t for q in q_pdf["query"] for t in oracle_tokenize(q, REFERENCE_PROFILE)
    })
    avgdl_s = float(coll.first()["avgdl"])
    res = wand_topk(qt, postings, docs_ord, coll, bm25, k=10,
                    terms=batch_terms, avgdl=avgdl_s)
    n_res = res.count()
    ph["wand"] = time.time() - t0

    ph["total"] = time.time() - t_all
    spark.stop()
    print(json.dumps({
        "cores": cores, "turns": len(tr_pdf), "n_post": int(n_post),
        "n_res": int(n_res),
        "phases": {k: round(v, 2) for k, v in ph.items()},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
