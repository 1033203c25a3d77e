"""Dedup operator tests: exact, n-gram Jaccard, MinHash+LSH, SimHash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_retrieval_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_near_dupes,
    minhash_signatures,
    shingle_dictionary,
    shingles,
    simhash_signatures,
)

DOCS = [
    ("d1", "the quick brown fox jumps over the lazy dog tonight"),
    ("d2", "the quick brown fox jumps over the lazy dog tonight"),   # exact dup of d1
    ("d3", "the quick brown fox jumps over the lazy cat tonight"),   # near dup
    ("d4", "completely different words about spark and shuffles here"),
    ("d5", "another unrelated text mentioning indexes and postings"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def py_shingles(text, k=3):
    toks = text.lower().split()
    return {"_".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_exact_dedup(docs):
    rows = {r["doc_id"]: r["n_dupes"] for r in exact_dedup(docs).collect()}
    assert rows["d1"] == 2 and "d2" not in rows
    assert rows["d3"] == 1 and rows["d4"] == 1 and rows["d5"] == 1


def test_shingles_match_python(docs):
    got = {}
    for r in shingles(docs, k=3).collect():
        got.setdefault(r["doc_id"], set()).add(r["shingle"])
    for did, text in DOCS:
        assert got.get(did, set()) == py_shingles(text), did


def test_jaccard_exact(docs):
    sh = shingles(docs, k=3)
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in jaccard_pairs(sh).collect()}
    s1, s3 = py_shingles(DOCS[0][1]), py_shingles(DOCS[2][1])
    want_13 = round(len(s1 & s3) / len(s1 | s3), 6)
    assert pairs[("d1", "d2")] == 1.0
    assert pairs[("d1", "d3")] == want_13
    assert ("d1", "d4") not in pairs  # no shared shingles


def test_minhash_lsh_finds_near_dupes(docs):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_near_dupes(docs, k=3, n_hashes=16, rows_per_band=4,
                                    threshold=0.4).collect()
    }
    assert ("d1", "d2") in got and got[("d1", "d2")] == 1.0
    assert ("d1", "d3") in got  # near-dup must be caught (identical minhash bands likely)
    assert all(a.startswith("d") for a, _ in got)


def test_minhash_signature_properties(docs):
    sh = shingles(docs, k=3)
    d = shingle_dictionary(sh)
    sig = minhash_signatures(sh, d, n_hashes=8)
    rows = sig.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] == 8 for r in rows)
    # identical docs -> identical signatures
    s = {(r["doc_id"], r["r"]): r["minh"] for r in sig.collect()}
    for r in range(8):
        assert s[("d1", r)] == s[("d2", r)]


def test_simhash(docs):
    sh_tf = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.trim(F.lower("text")), r"\s+"), lambda t: t != F.lit(""))
        ).alias("shingle"),
    ).groupBy("doc_id", "shingle").agg(F.count("*").alias("tf"))
    d = shingle_dictionary(sh_tf.select("shingle").distinct())
    sig = {r["doc_id"]: r["simhash"] for r in
           simhash_signatures(sh_tf, d, bits=64).collect()}
    assert len(sig["d1"]) == 64 and set(sig["d1"]) <= {"0", "1"}
    assert sig["d1"] == sig["d2"]  # identical text -> identical simhash
    ham_13 = sum(a != b for a, b in zip(sig["d1"], sig["d3"]))
    ham_14 = sum(a != b for a, b in zip(sig["d1"], sig["d4"]))
    assert ham_13 < ham_14  # near-dup closer than unrelated doc


def test_lsh_candidates_subset_of_sharing_docs(docs):
    sh = shingles(docs, k=3)
    d = shingle_dictionary(sh)
    sig = minhash_signatures(sh, d, n_hashes=16)
    cand = {(r["doc_a"], r["doc_b"])
            for r in lsh_candidate_pairs(lsh_bands(sig, 4)).collect()}
    # candidates must at least include the exact dup pair
    assert ("d1", "d2") in cand


def test_hot_shingle_candidate_path_no_quadratic_blowup(spark):
    """A boilerplate shingle shared by EVERY doc must not quadratically blow
    up jaccard_pairs when a small candidate set restricts the verify join:
    the candidate-first join is linear in candidates, so 10k docs sharing one
    shingle verify 3 pairs without forming the ~10^8 co-shingle pairs."""
    import pandas as pd

    from document_retrieval_spark.operators.dedup import jaccard_pairs

    n = 10_000
    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i:05d}" for i in range(n)],
            # every doc: the hot boilerplate shingle + one unique shingle,
            # except d00001 duplicates d00000's unique shingle
            "text": [
                "hot boiler plate " + ("alpha beta gamma" if i <= 1 else f"u{i} v{i} w{i}")
                for i in range(n)
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    sh = shingles(docs, k=3)
    cand = spark.createDataFrame(
        [("d00000", "d00001"), ("d00000", "d00002"), ("d00005", "d00006")],
        ["doc_a", "doc_b"],
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(sh, cand).collect()
    }
    # d00000 vs d00001: identical shingle sets -> jaccard 1.0
    assert got[("d00000", "d00001")] == 1.0
    # d00000 vs d00002 / d00005 vs d00006: share only the boilerplate prefix
    assert 0.0 < got[("d00000", "d00002")] < 0.5
    assert got[("d00005", "d00006")] == got[("d00000", "d00002")]
    assert len(got) == 3

    # scale guard: capping shingle df excludes the boilerplate shingles, so
    # the d00000/d00002 pair (common = boilerplate only) disappears while the
    # true near-dupe pair survives on its unique shingles
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(sh, cand, max_shingle_df=100).collect()
    }
    assert ("d00000", "d00002") not in capped
    assert capped[("d00000", "d00001")] == 1.0


def test_wide_bands_equal_long_form(docs):
    """lsh_bands_wide (one MIN aggregation + stack, the minhash_near_dupes
    fast path since r6) must be row-identical to the long-form
    minhash_signatures -> lsh_bands pipeline, including a non-divisible
    n_hashes/rows_per_band split (trailing short band)."""
    from document_retrieval_spark.operators.dedup import lsh_bands_wide

    sh = shingles(docs, k=3)
    d = shingle_dictionary(sh)
    ids = sh.join(d, "shingle").select("doc_id", "sid")
    for n_hashes, rpb in ((16, 4), (10, 4)):
        long_form = sorted(
            (r["doc_id"], r["band"], r["band_key"])
            for r in lsh_bands(
                minhash_signatures(sh, d, n_hashes=n_hashes), rpb
            ).collect()
        )
        wide = sorted(
            (r["doc_id"], r["band"], r["band_key"])
            for r in lsh_bands_wide(ids, n_hashes=n_hashes,
                                    rows_per_band=rpb).collect()
        )
        assert wide == long_form
