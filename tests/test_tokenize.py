"""Native-F tokenizer == oracle tokenizer, token for token, across configs
(SURVEY.md §5.2: engine and oracle share one tokenizer config object)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_retrieval_spark.config import (
    REFERENCE_PROFILE,
    SQL_SAFE_PROFILE,
    TokenizerConfig,
)
from document_retrieval_spark.functions.text import tokenize_expr, tokenize_pandas_udf
from document_retrieval_spark.oracle import oracle_tokenize

CASES = [
    "Hello, world! This is a TEST.",
    "  leading and   multiple   spaces\tand tabs ",
    "punct!@#$%^&*()_+-=[]{}|;':\",./<>?everywhere",
    "",
    "The the THE tHe stopword Case keeps Original",
    "a.b,c;d:e f_g h-i",
    "unicode café naïve 北京 mixed",
    "numbers 123 45.67 8,900",
    # non-ASCII whitespace: NBSP, line separator (U+2028), ogham space,
    # ideographic space, thin space, NEL, file separator (U+001C) — Python's
    # str.split() treats all of these as whitespace; the engine must too
    "nbsp\u00a0separated\u2028and\u1680more\u3000kinds\u2009of\x1cspace\x85here",
    "\u00a0leading\u202fund\u205ftrailing\u2028",
]

CONFIGS = [
    REFERENCE_PROFILE,
    SQL_SAFE_PROFILE,
    TokenizerConfig(lowercase=True, punct_mode="space"),
    TokenizerConfig(punct_mode="delete", bigrams=True),
    TokenizerConfig(lowercase=True, punct_mode="alnum_space", stopwords=(), bigrams=True),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[str(i) for i in range(len(CONFIGS))])
def test_native_expr_matches_oracle(spark, cfg):
    df = spark.createDataFrame([(t,) for t in CASES], ["text"])
    got = [
        r["toks"]
        for r in df.select(tokenize_expr(F.col("text"), cfg).alias("toks"))
        .collect()
    ]
    want = [oracle_tokenize(t, cfg) for t in CASES]
    assert got == want


def test_pandas_udf_matches_oracle(spark):
    cfg = REFERENCE_PROFILE
    df = spark.createDataFrame([(t,) for t in CASES], ["text"])
    got = [
        r["toks"]
        for r in df.select(tokenize_pandas_udf(cfg)(F.col("text")).alias("toks"))
        .collect()
    ]
    want = [oracle_tokenize(t, cfg) for t in CASES]
    assert got == want


def test_fixture_corpus_tokens_match(spark, transcripts_df, oracle_docs):
    """Whole fixture corpus through doc assembly + native tokenizer."""
    from document_retrieval_spark.operators import assemble_documents

    docs = assemble_documents(transcripts_df)
    toks = docs.select(
        "docid", tokenize_expr(F.col("text"), REFERENCE_PROFILE).alias("toks")
    )
    got = {r["docid"]: r["toks"] for r in toks.collect()}
    for docid, text in oracle_docs:
        assert got[docid] == oracle_tokenize(text, REFERENCE_PROFILE), docid


def test_negative_docs_json_parse(spark, queries_df):
    """negative_docs is a JSON-encoded list string (reference parse path
    `text_preprocessing_and_tfidf.py:267`) -> F.from_json."""
    from pyspark.sql import functions as F, types as T

    parsed = queries_df.select(
        "query_id",
        "positive_docs",
        F.from_json("negative_docs", T.ArrayType(T.StringType())).alias("negs"),
    )
    rows = parsed.collect()
    assert all(isinstance(r["negs"], list) and 1 <= len(r["negs"]) <= 3 for r in rows)
    assert all(r["positive_docs"] not in r["negs"] for r in rows)


def test_wordpunct_engine_equals_oracle(spark):
    """F2c hermetic wordpunct mode (`team_run1.py:72-75`): JVM
    regexp_extract_all path == Python re.findall oracle, including the
    reference's `t not in string.punctuation` substring quirk."""
    from document_retrieval_spark.config import TokenizerConfig
    from document_retrieval_spark.functions.text import tokenize_expr
    from document_retrieval_spark.oracle.bm25 import oracle_tokenize

    texts = [
        "don't stop!! believing...",
        "hello, world (again)",
        "a#$b #$ !! ?!",          # "#$" is a substring of string.punctuation
        "café's naïve résumé",
        "나는 학교에서, 공부한다!",
        "under_score mixed123 ...",
        "",
        "   ",
    ]
    for cfg in (
        TokenizerConfig(split_mode="wordpunct", punct_mode="delete",
                        stopwords=()),
        TokenizerConfig(split_mode="wordpunct", lowercase=True,
                        stopwords=("the", "a")),
    ):
        df = spark.createDataFrame([(t,) for t in texts], ["text"])
        got = [
            r["toks"]
            for r in df.select(
                tokenize_expr(F.col("text"), cfg).alias("toks")
            ).collect()
        ]
        want = [oracle_tokenize(t, cfg) for t in texts]
        assert got == want, list(zip(texts, got, want))
    # the quirk itself, pinned: "#$" is dropped (substring), "?!" is kept
    cfg = TokenizerConfig(split_mode="wordpunct", stopwords=())
    assert "#$" not in oracle_tokenize("a #$ b", cfg)
    assert "?!" in oracle_tokenize("a ?! b", cfg)
