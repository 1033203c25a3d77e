"""Structured-streaming ingest tests (file source, synchronous drain)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from document_retrieval_spark.config import REFERENCE_PROFILE
from document_retrieval_spark.fixtures import transcripts_schema
from document_retrieval_spark.streaming import (
    incremental_term_stats,
    streaming_turn_counts,
)


@pytest.fixture(scope="module")
def stream_dir(transcripts_pdf, tmp_path_factory):
    d = tmp_path_factory.mktemp("turns_stream")
    # microsecond timestamps: Spark's typed parquet reader rejects ns INT64
    transcripts_pdf.to_parquet(
        d / "part0.parquet", index=False,
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )
    return str(d)


def test_streaming_turn_counts(spark, stream_dir, transcripts_pdf):
    stream = spark.readStream.schema(transcripts_schema()).parquet(stream_dir)
    agg = streaming_turn_counts(stream, window="1 hour", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("turns_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "select sum(n_turns) as n from turns_out"
    ).collect()[0]["n"]
    assert got == len(transcripts_pdf)


def test_incremental_term_stats_match_batch(spark, stream_dir, transcripts_df,
                                            tmp_path_factory):
    out = str(tmp_path_factory.mktemp("delta_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    stream = spark.readStream.schema(transcripts_schema()).parquet(stream_dir)
    q = incremental_term_stats(stream, REFERENCE_PROFILE, out, ckpt)
    q.awaitTermination(120)

    from document_retrieval_spark.functions.text import tokenize_expr

    deltas = spark.read.parquet(out)
    got = {
        r["term"]: r["tf"]
        for r in deltas.groupBy("term").agg(F.sum("tf_delta").alias("tf")).collect()
    }
    want = {
        r["term"]: r["n"]
        for r in transcripts_df.select(
            F.explode(tokenize_expr(F.col("text"), REFERENCE_PROFILE)).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_assemble_documents(spark, stream_dir, transcripts_pdf):
    """Sessionized streaming doc assembly reproduces the batch assembly
    (per-turn text equality through the streaming path)."""
    from document_retrieval_spark.streaming import streaming_assemble_documents

    stream = spark.readStream.schema(transcripts_schema()).parquet(stream_dir)
    # conversations in the fixture are 1-12 turns, 1s apart -> gap 1 minute
    # sessionizes each conversation into exactly one window
    agg = streaming_assemble_documents(stream, gap="1 minute", watermark="0 seconds")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("docs_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["conv_id"]: (r["text"], r["n_turns"])
        for r in spark.sql("select * from docs_out").collect()
    }
    ordered = transcripts_pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    want = ordered.groupby("conv_id", sort=True).agg(
        text=("text", " ".join), n=("text", "size")
    )
    assert len(got) == len(want)
    for conv_id, row in want.iterrows():
        assert got[conv_id] == (row["text"], row["n"]), conv_id
