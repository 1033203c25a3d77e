"""Hypothesis property tests for the posting codec and the row-local
repetition analyzer — the codec ones are pure Python/NumPy (no Spark), so
they fuzz hundreds of cases in milliseconds.

The codec invariants these pin:
- vb round-trip on arbitrary uint64 values (incl. the 2^63..2^64-1 range,
  multi-byte continuation boundaries 127/128, 16383/16384, ...)
- delta round-trip on arbitrary strictly-increasing int64 ordinals
- delta rejects non-increasing input loudly (a silent mis-encode would
  corrupt an index segment)
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from document_retrieval_spark.operators.codec import (
    delta_decode,
    delta_encode,
    vb_decode,
    vb_encode,
)

u64 = st.integers(min_value=0, max_value=(1 << 64) - 1)
boundary = st.sampled_from(
    [0, 1, 127, 128, 16383, 16384, (1 << 35) - 1, (1 << 63), (1 << 64) - 1]
)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.one_of(u64, boundary), max_size=200))
def test_vb_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = vb_decode(vb_encode(arr))
    assert out.dtype == np.uint64 and np.array_equal(out, arr)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=1 << 40), min_size=0, max_size=200
    ),
    st.integers(min_value=0, max_value=1 << 40),
)
def test_delta_roundtrip(gaps, first):
    ords = (np.cumsum([first] + gaps)).astype(np.int64)
    assert np.array_equal(delta_decode(delta_encode(ords)), ords)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=2, max_size=50)
)
def test_delta_rejects_non_increasing(vals):
    arr = np.sort(np.array(vals, dtype=np.int64))[::-1].copy()
    try:
        delta_encode(arr)
    except ValueError:
        return
    # encode succeeded -> input must have been strictly increasing
    assert np.all(np.diff(arr) > 0)


# ---------------------------------------------------------------- repetition

VOCAB = ["a", "b", "ab", "x y", "zz"]
MAX_WORDS = 6


def _rep_oracle(text: str):
    toks = [t for t in text.lower().strip().split() if t]
    bigrams = [f"{x} {y}" for x, y in zip(toks, toks[1:])]
    top = max((bigrams.count(b) for b in set(bigrams)), default=0)
    return len(toks), len(set(toks)), len(bigrams), top


@pytest.fixture(scope="module")
def rep_table(spark):
    """repetition_stats over EVERY text hypothesis can draw (the full
    <=MAX_WORDS closure of VOCAB, ~20k rows) in ONE Spark job — hypothesis
    re-enters the test dozens of times and a job per example would take
    minutes."""
    from itertools import product

    import pandas as pd

    from document_retrieval_spark.functions.analysis import repetition_stats

    texts = {""}
    for k in range(1, MAX_WORDS + 1):
        texts |= {" ".join(p) for p in product(VOCAB, repeat=k)}
    pdf = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": sorted(texts)}
    )
    out = repetition_stats(spark.createDataFrame(pdf)).toPandas()
    txt = dict(zip(pdf["doc_id"], pdf["text"]))
    return {txt[r["doc_id"]]: r for _, r in out.iterrows()}


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(VOCAB), max_size=MAX_WORDS))
def test_repetition_maxrun_matches_counter_oracle(rep_table, words):
    """The array_sort+max-run SQL expression == a counter-based Python
    oracle. Vocabulary is tiny on purpose — repetition (equal runs, repeated
    bigrams, multi-token 'words') is the interesting regime."""
    text = " ".join(words)
    n, nd, nb, top = _rep_oracle(text)
    got = rep_table[text]
    assert (
        got["n_tokens"],
        got["n_distinct_tokens"],
        got["n_bigrams"],
        got["top_bigram_count"],
    ) == (n, nd, nb, top), text
