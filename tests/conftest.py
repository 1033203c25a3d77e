from __future__ import annotations

import os

import pandas as pd
import pytest

# unit tests assert semantics, not steady-state latency: skip the session
# warm-start pass (and keep CLI subprocesses spawned by tests fast too)
os.environ.setdefault("SPARK_GRAFT_WARMUP", "0")

from document_retrieval_spark.config import REFERENCE_PROFILE, BM25Config
from document_retrieval_spark.fixtures import gen_queries, gen_transcripts
from document_retrieval_spark.oracle import build_oracle_index
from document_retrieval_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_pdf() -> pd.DataFrame:
    # t1 smoke scale (FIXTURES.md §1): 50 conversations, ~300 turns
    return gen_transcripts(50, seed=42)


@pytest.fixture(scope="session")
def queries_pdf(transcripts_pdf) -> pd.DataFrame:
    return gen_queries(transcripts_pdf, 50, seed=43)


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pdf):
    from document_retrieval_spark.fixtures import transcripts_schema

    return spark.createDataFrame(transcripts_pdf, schema=transcripts_schema())


@pytest.fixture(scope="session")
def queries_df(spark, queries_pdf):
    return spark.createDataFrame(queries_pdf)


@pytest.fixture(scope="session")
def oracle_docs(transcripts_pdf) -> list[tuple[str, str]]:
    by = transcripts_pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    doc_text = by.groupby("conv_id", sort=True)["text"].agg(" ".join)
    return list(doc_text.items())


@pytest.fixture(scope="session")
def oracle_index(oracle_docs):
    return build_oracle_index(oracle_docs, REFERENCE_PROFILE)


@pytest.fixture(scope="session")
def bm25_cfg() -> BM25Config:
    return BM25Config()
