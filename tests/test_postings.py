"""Index structural invariants (SURVEY.md §5.2 item 3): varbyte round-trip
property tests, sorted posting lists, block-max dominance, df consistency."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from document_retrieval_spark.config import (
    REFERENCE_PROFILE,
    BM25Config,
    IndexConfig,
)
from document_retrieval_spark.operators.codec import (
    delta_decode,
    delta_encode,
    vb_decode,
    vb_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_round_trip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert vb_decode(vb_encode(arr)).tolist() == vals


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True
    )
)
@settings(max_examples=200, deadline=None)
def test_delta_round_trip(vals):
    arr = np.array(sorted(vals), dtype=np.int64)
    assert delta_decode(delta_encode(arr)).tolist() == sorted(vals)


def test_delta_rejects_unsorted():
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 3], dtype=np.int64))


@pytest.fixture(scope="module")
def index_tables(spark, transcripts_df):
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

    docs = tokenize_documents(assemble_documents(transcripts_df), REFERENCE_PROFILE)
    docs_ord = assign_doc_ordinals(docs.select("docid", "dl"))
    docs_ord.cache()
    tf = term_frequencies(tokenize_documents(assemble_documents(transcripts_df), REFERENCE_PROFILE))
    stats = build_term_stats(tf, collection_stats(docs))
    tf_ord = tf.join(docs_ord, "docid")
    # low salt threshold to force the salted path on fixture data
    cfg = IndexConfig(n_shards=8, salt_df_threshold=10, n_salts=4, block_size=16)
    postings = build_postings(tf_ord, stats, cfg, BM25Config(), seg_postings=64)
    postings.cache()
    return docs_ord, tf, stats, postings, cfg


def test_ordinals_dense_and_sorted(index_tables, oracle_index):
    docs_ord, *_ = index_tables
    rows = sorted(
        (r["doc_ord"], r["docid"]) for r in docs_ord.collect()
    )
    assert [o for o, _ in rows] == list(range(len(rows)))
    # ascending docid order == corpus order (oracle doc_ids are docid-sorted)
    assert [d for _, d in rows] == oracle_index.doc_ids


def test_round_trip_postings_match_tf(index_tables):
    from document_retrieval_spark.operators.postings import decode_postings_df

    docs_ord, tf, _, postings, _ = index_tables
    decoded = decode_postings_df(postings)
    want = {
        (r["term"], r["doc_ord"]): (r["tf"], r["dl"])
        for r in tf.join(docs_ord, "docid").collect()
    }
    got = {
        (r["term"], r["doc_ord"]): (r["tf"], r["dl"]) for r in decoded.collect()
    }
    assert got == want


def test_posting_lists_strictly_increasing_and_blockmax(index_tables, bm25_cfg):
    from document_retrieval_spark.operators.codec import (
        delta_decode,
        vb_decode,
    )

    docs_ord, _, stats, postings, cfg = index_tables
    avgdl = stats.select("avgdl").first()["avgdl"]
    k1, b = bm25_cfg.k1, bm25_cfg.b
    for row in postings.collect():
        prev = -1
        assert row["n_postings"] == sum(bl["n"] for bl in row["blocks"])
        for bl in row["blocks"]:
            ords = delta_decode(bytes(bl["docs"]))
            tfs = vb_decode(bytes(bl["tfs"])).astype(np.float64)
            dls = vb_decode(bytes(bl["dls"])).astype(np.float64)
            assert (np.diff(ords) > 0).all(), row["term"]
            assert ords[0] > prev, row["term"]  # across blocks too
            prev = int(ords[-1])
            assert bl["base"] == ords[0] and bl["last"] == ords[-1]
            q = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + dls / avgdl))
            assert bl["max_q"] >= q.max() - 1e-12, row["term"]
            assert abs(bl["max_q"] - q.max()) < 1e-9  # tight, not just >=


def test_df_consistency_and_segments(index_tables):
    import pyspark.sql.functions as F

    _, tf, stats, postings, _ = index_tables
    per_term = postings.groupBy("term").agg(
        F.sum("n_postings").alias("n"),
        F.first("df").alias("df"),
        F.countDistinct("seg_id").alias("nseg"),
        F.first("n_segs").alias("n_segs"),
    )
    bad = per_term.filter(
        (F.col("n") != F.col("df")) | (F.col("nseg") != F.col("n_segs"))
    ).count()
    assert bad == 0
    # every term present
    assert per_term.count() == stats.count() == tf.select("term").distinct().count()


def test_salting_splits_hot_terms(spark, index_tables):
    """With salt_df_threshold=10 and n_salts=4, hot terms (df>10) must have
    been built through >1 salted partial — we can't observe the shuffle
    directly, so assert the config path ran by checking merge correctness for
    the hottest term plus segment splitting for df > seg_postings."""
    docs_ord, tf, stats, postings, cfg = index_tables
    hottest = (
        stats.orderBy("df", ascending=False).select("term", "df").first()
    )
    assert hottest["df"] > cfg.salt_df_threshold  # fixture guarantees hot terms
    seg = postings.filter(postings.term == hottest["term"]).collect()
    total = sum(r["n_postings"] for r in seg)
    assert total == hottest["df"]


def test_shuffle_stats_join_equals_broadcast(spark, index_tables):
    """stats_broadcast=False (the extreme-vocab path: both stats joins
    downgrade to shuffle joins) must produce an identical index."""
    from document_retrieval_spark.operators.postings import (
        build_postings,
        decode_postings_df,
    )

    docs_ord, tf, stats, postings, cfg = index_tables
    # disable size-based broadcast conversion so the un-hinted joins really
    # execute as shuffle joins (on fixture-sized stats AQE would otherwise
    # silently broadcast them and this test would exercise nothing new)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # seg_postings=63 (not the fixture's 64): an identical closure would
        # cache-match the fixture's CACHED postings plan (CacheManager
        # canonicalization erases broadcast hints) and serve the broadcast
        # plan from cache; decoded content is segmentation-invariant
        alt = build_postings(tf.join(docs_ord, "docid"), stats, cfg,
                             BM25Config(), seg_postings=63,
                             stats_broadcast=False)
        want = {(r["term"], r["doc_ord"]): (r["tf"], r["dl"])
                for r in decode_postings_df(postings).collect()}
        got = {(r["term"], r["doc_ord"]): (r["tf"], r["dl"])
               for r in decode_postings_df(alt).collect()}
        assert got == want and len(got) > 0
        plan = alt._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_string_mode_multilang_segments_not_interleaved(spark):
    """r4 ADVICE (postings.py:303): in STRING mode with a lang column the
    same term string can occur in several languages; lang must be part of
    the shuffle/sort key or same-term rows from different languages
    interleave by doc_ord and the encoder opens a new segment per
    alternation. With all postings far under seg_postings, each
    (term, lang) posting list must encode as exactly ONE segment with
    n_segs == 1 counted per (term, lang), not across languages."""
    import pandas as pd

    from document_retrieval_spark.operators.postings import build_postings

    # 'shared' alternates en/fr by doc_ord — the worst interleave case
    rows = []
    for doc_ord in range(8):
        lang = "en" if doc_ord % 2 == 0 else "fr"
        rows.append(("d%d" % doc_ord, doc_ord, "shared", 2, 5, lang))
        rows.append(("d%d" % doc_ord, doc_ord, "only_%s" % lang, 1, 5, lang))
    tf_ord = spark.createDataFrame(
        pd.DataFrame(rows, columns=["docid", "doc_ord", "term", "tf", "dl", "lang"])
    )
    stats = spark.createDataFrame(
        pd.DataFrame(
            [
                ("shared", "en", 4, 0.5, 4, 5.0),
                ("shared", "fr", 4, 0.5, 4, 5.0),
                ("only_en", "en", 4, 0.5, 4, 5.0),
                ("only_fr", "fr", 4, 0.5, 4, 5.0),
            ],
            columns=["term", "lang", "df", "idf", "n_docs", "avgdl"],
        )
    )
    cfg = IndexConfig(n_shards=4, salt_df_threshold=100, block_size=16,
                      lang_col="lang")
    seg = build_postings(
        tf_ord, stats, cfg, BM25Config(), seg_postings=1024,
        lang_col="lang", avgdl_by_lang={"en": 5.0, "fr": 5.0},
    ).collect()
    by_key = {(r["term"], r["lang"]): r for r in seg}
    assert len(seg) == 4, [
        (r["term"], r["lang"], r["seg_id"]) for r in seg
    ]  # one segment per (term, lang) — no interleave splits
    for (term, lang), r in by_key.items():
        assert r["n_segs"] == 1 and r["seg_id"] == 0, (term, lang, r)
        assert r["n_postings"] == 4


def test_single_partition_ordinals_lazy_and_dense(spark):
    """n_parts == 1 (reached via the driver-known approx_rows hint) takes
    the deterministic global-window path: no materialization barrier, same
    dense 0..N-1 ascending-by-key ordinals as the two-pass plan."""
    import pandas as pd

    from document_retrieval_spark.operators.postings import assign_doc_ordinals

    docs = spark.createDataFrame(
        pd.DataFrame({
            "docid": [f"c{i:04d}" for i in range(300)][::-1],
            "dl": list(range(300))[::-1],
        })
    )
    a = {r["docid"]: r["doc_ord"]
         for r in assign_doc_ordinals(docs, approx_rows=300).collect()}
    b = {r["docid"]: r["doc_ord"]
         for r in assign_doc_ordinals(docs, n_parts=4).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(300))
    # ascending by docid
    ordered = [k for k, _ in sorted(a.items(), key=lambda kv: kv[1])]
    assert ordered == sorted(a)


def test_arrow_encoder_matches_pandas_encoder(spark, transcripts_df, monkeypatch):
    """The mapInArrow vectorized encoder and the per-group pandas encoder
    (the executable spec) must produce the same segments byte-for-byte:
    same (term, salt-range) segmentation, same block boundaries/bounds and
    identical varbyte streams."""
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

    docs = tokenize_documents(assemble_documents(transcripts_df), REFERENCE_PROFILE)
    docs_ord = assign_doc_ordinals(docs.select("docid", "dl"))
    tf = term_frequencies(docs)
    stats = build_term_stats(tf, collection_stats(docs))
    tf_ord = tf.join(docs_ord, "docid")
    # small blocks/segments + low salt threshold: multi-block, multi-segment,
    # salted groups all exercised; tiny Arrow batches force the carry path
    cfg = IndexConfig(n_shards=8, salt_df_threshold=10, n_salts=4, block_size=16)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        def norm(df):
            rows = []
            for r in df.collect():
                rows.append((
                    r["term"], r["n_postings"], r["first_ord"], r["last_ord"],
                    round(r["max_q"], 12),
                    tuple(
                        (b["base"], b["last"], b["n"], round(b["max_q"], 12),
                         bytes(b["docs"]), bytes(b["tfs"]), bytes(b["dls"]))
                        for b in r["blocks"]
                    ),
                ))
            return sorted(rows)

        monkeypatch.setenv("SPARK_GRAFT_ENCODER", "pandas")
        ref = norm(build_postings(tf_ord, stats, cfg, BM25Config(), seg_postings=64))
        monkeypatch.setenv("SPARK_GRAFT_ENCODER", "arrow")
        got = norm(build_postings(tf_ord, stats, cfg, BM25Config(), seg_postings=64))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
    assert got == ref
