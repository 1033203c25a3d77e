#!/usr/bin/env python3
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Headline queries (engine path, on $SPARK_GRAFT_SF_DIR tables + a synthetic
transcript corpus scaled to the sf):
  index_build        transcripts -> salted, delta+varbyte postings (full path)
  bm25_wand          200-query batch, block-max WAND over the built index
  bm25_exhaustive    same batch through the join scorer (differential twin)
  cosine_topk        TF-IDF cosine batch
  dedup_minhash      MinHash+LSH near-dupes over documents
  ann_brute          brute-force cosine top-10 over embeddings
  text_quality       quality-signal scan over documents

Scaling evidence (north_rule; no real cluster in this sandbox — per driver
instruction, the same job runs at two local parallelism levels): index build
+ WAND batch at local[N] and local[4N]; efficiency =
(throughput_4N / throughput_N) / 4. Results also land in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE_N = int(os.environ.get("BENCH_SCALE_N", "4"))  # N vs 4N parallelism

# synthetic transcript corpus sized by sf (turns ~ 6.5x conversations)
_SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_CONV = max(200, int(200_000 * _SF))
N_QUERIES = 200


def _mk_corpus():
    from document_retrieval_spark.fixtures import gen_queries, gen_transcripts

    tr = gen_transcripts(N_CONV, seed=42)
    q = gen_queries(tr, N_QUERIES, seed=43)
    return tr, q


def _transcripts_parquet(tr_pdf) -> str:
    """Materialize the synthetic corpus as parquet ONCE (untimed): the build
    must read a distributed table scan, not a driver-local relation that gets
    re-shipped serially on every action."""
    import hashlib
    import tempfile

    key = hashlib.md5(
        f"{len(tr_pdf)}-{tr_pdf['conv_id'].iloc[0]}-{tr_pdf['conv_id'].iloc[-1]}".encode()
    ).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"bench_transcripts_{key}.parquet")
    if not os.path.exists(path):
        tr_pdf.to_parquet(
            path, index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
    return path


def _build_and_query(spark, tr_pdf, q_pdf, k=10):
    """Returns (build_sec, query_sec, n_turns, postings_df...) — the scaling
    unit job: full index build + WAND batch."""
    from pyspark.sql import functions as F

    from document_retrieval_spark.config import (
        REFERENCE_PROFILE,
        BM25Config,
        IndexConfig,
    )
    from document_retrieval_spark.operators import assemble_documents
    from document_retrieval_spark.operators.postings import (
        assign_doc_ordinals,
        build_postings,
    )
    from document_retrieval_spark.operators.stats import (
        build_term_stats,
        collection_stats,
        term_frequencies,
        tokenize_documents,
    )
    from document_retrieval_spark.query import prepare_query_terms
    from document_retrieval_spark.query.wand import wand_topk

    bm25 = BM25Config()
    path = _transcripts_parquet(tr_pdf)
    transcripts = spark.read.parquet(path).repartition(
        spark.sparkContext.defaultParallelism * 2
    )
    queries = spark.createDataFrame(q_pdf[["query_id", "query"]])

    t0 = time.time()
    # tokenize+assemble ONCE, persisted — every downstream stage reuses it
    docs = tokenize_documents(assemble_documents(transcripts), REFERENCE_PROFILE)
    docs = docs.persist()
    # lazy persists — the single postings action below materializes the DAG
    # once (extra .count() actions each cost a full job of scheduler floor)
    docs_ord = assign_doc_ordinals(docs.select("docid", "dl")).persist()
    tf = term_frequencies(docs)
    coll = collection_stats(docs).persist()
    stats = build_term_stats(tf, coll)
    postings = build_postings(
        tf.join(docs_ord, "docid"), stats,
        IndexConfig(n_shards=64, salt_df_threshold=2000, n_salts=8), bm25,
    )
    postings.persist()
    n_post = postings.agg(F.sum("n_postings")).collect()[0][0]
    build_sec = time.time() - t0

    t0 = time.time()
    qt = prepare_query_terms(queries, REFERENCE_PROFILE, bm25)
    res = wand_topk(qt, postings, docs_ord, coll, bm25, k=k)
    n_res = res.count()
    query_sec = time.time() - t0
    assert n_res > 0 and n_post > 0
    # persist tf/stats so the downstream headline queries (exhaustive/cosine)
    # don't recompute them per action
    tf = tf.persist()
    stats = stats.persist()
    return build_sec, query_sec, docs_ord, coll, postings, stats, tf, docs


def _probe(cores: int) -> dict:
    """Run the scaling-unit job (build + WAND batch) in THIS process."""
    from document_retrieval_spark.session import get_spark

    tr_pdf, q_pdf = _mk_corpus()
    spark = get_spark(f"bench_probe_{cores}", master=f"local[{cores}]",
                      shuffle_partitions=max(cores * 2, 8))
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    b, q, *_ = _build_and_query(spark, tr_pdf, q_pdf)
    spark.stop()
    return {"cores": cores, "build_sec": round(b, 3), "query_sec": round(q, 3),
            "turns": len(tr_pdf)}


def _probe_subprocess(cores: int) -> dict:
    """Each parallelism level gets a FRESH process: a second SparkContext in
    the same JVM inherits thread-pool state from the first and poisons the
    scaling measurement (observed: 4N slower than N in-process, 3.9x faster
    out-of-process)."""
    import subprocess

    out = subprocess.run(
        [sys.executable, __file__, "--probe", str(cores)],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=1800,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--probe":
        print(json.dumps(_probe(int(sys.argv[2]))))
        return 0

    tr_pdf, q_pdf = _mk_corpus()
    n_turns = len(tr_pdf)
    queries_sec: dict[str, float] = {}
    extras: dict = {}

    # ---- scaling runs in separate subprocesses, interleaved best-of-R:
    # the sandbox host shows up to 3x run-to-run noise on identical work, so
    # each parallelism level is sampled R times alternately and the MIN
    # (least-interference window) is reported ----
    reps = int(os.environ.get("BENCH_REPS", "3"))
    runs_n, runs_4n = [], []
    for _ in range(reps):
        runs_n.append(_probe_subprocess(SCALE_N))
        runs_4n.append(_probe_subprocess(SCALE_N * 4))
    best_n = min(runs_n, key=lambda r: r["build_sec"] + r["query_sec"])
    best_4n = min(runs_4n, key=lambda r: r["build_sec"] + r["query_sec"])
    b_n, q_n = best_n["build_sec"], best_n["query_sec"]
    b_4n, q_4n = best_4n["build_sec"], best_4n["query_sec"]
    queries_sec["index_build"] = b_4n
    queries_sec["bm25_wand"] = q_4n

    # ---- main session for the remaining headline queries ----
    from document_retrieval_spark.session import get_spark

    spark = get_spark("bench_main", master=f"local[{SCALE_N * 4}]",
                      shuffle_partitions=max(SCALE_N * 8, 16))
    _, _, docs_ord, coll, postings, stats, tf, docs = _build_and_query(
        spark, tr_pdf, q_pdf
    )

    thr_n = n_turns / (b_n + q_n)
    thr_4n = n_turns / (b_4n + q_4n)
    extras["scaling"] = {
        "n_cores": SCALE_N,
        "4n_cores": SCALE_N * 4,
        "turns": n_turns,
        "throughput_n_turns_per_sec": round(thr_n, 1),
        "throughput_4n_turns_per_sec": round(thr_4n, 1),
        "efficiency": round(thr_4n / thr_n / 4.0, 3),
        "samples_n": [[r["build_sec"], r["query_sec"]] for r in runs_n],
        "samples_4n": [[r["build_sec"], r["query_sec"]] for r in runs_4n],
        "note": "best-of-reps per level, interleaved; sandbox host shows up "
                "to 3x timing noise on identical work",
    }
    extras["index"] = {
        "turns_per_sec_build": round(n_turns / b_4n, 1),
        "queries_per_sec": round(N_QUERIES / q_4n, 1),
    }

    # ---- remaining headline queries on the 4N session ----
    from document_retrieval_spark.config import REFERENCE_PROFILE, BM25Config
    from document_retrieval_spark.query import (
        bm25_score_exhaustive,
        cosine_topk,
        prepare_query_terms,
    )

    bm25 = BM25Config()
    qdf = spark.createDataFrame(q_pdf[["query_id", "query"]])
    qt = prepare_query_terms(qdf, REFERENCE_PROFILE, bm25)

    t0 = time.time()
    bm25_score_exhaustive(
        qt, tf, stats, docs.select("docid", "dl"), bm25, k=10
    ).count()
    queries_sec["bm25_exhaustive"] = round(time.time() - t0, 3)

    t0 = time.time()
    cosine_topk(qt, tf, stats, k=10).count()
    queries_sec["cosine_topk"] = round(time.time() - t0, 3)

    import __spark_entry__ as entry_mod

    for name in ("dedup_minhash_lsh", "ann_cosine_topk", "text_quality"):
        t0 = time.time()
        entry_mod.queries()[name](spark, SF_DIR).count()
        key = {"dedup_minhash_lsh": "dedup_minhash",
               "ann_cosine_topk": "ann_brute"}.get(name, name)
        queries_sec[key] = round(time.time() - t0, 3)

    spark.stop()

    out = {
        "metric": "indexing+query wall time (synthetic transcripts, "
                  f"{n_turns} turns, {N_QUERIES} queries) + curation ops",
        "value": round(sum(queries_sec.values()), 3),
        "unit": "sec",
        "queries": queries_sec,
        "sf": _SF,
        **extras,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
