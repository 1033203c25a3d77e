"""Per-turn text-equality invariant under stable (conv_id, turn_idx) ordering
— required verbatim by BASELINE.json input_hint (SURVEY.md §5.2 item 2)."""

from __future__ import annotations

from document_retrieval_spark.operators import assemble_documents


def test_doc_text_equals_oracle_concat(transcripts_df, oracle_docs):
    docs = {r["docid"]: r["text"] for r in assemble_documents(transcripts_df).collect()}
    assert len(docs) == len(oracle_docs)
    for docid, text in oracle_docs:
        assert docs[docid] == text, docid


def test_per_turn_round_trip(transcripts_df, transcripts_pdf):
    """Each turn's text is recoverable verbatim from the assembled document:
    splitting the doc at the known turn lengths reproduces every turn."""
    docs = {r["docid"]: r["text"] for r in assemble_documents(transcripts_df).collect()}
    ordered = transcripts_pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    for conv_id, grp in ordered.groupby("conv_id", sort=True):
        blob = docs[conv_id]
        pos = 0
        for _, row in grp.iterrows():
            t = row["text"]
            assert blob[pos : pos + len(t)] == t, (conv_id, row["turn_idx"])
            pos += len(t) + 1  # separator


def test_turn_counts_and_ts_lineage(transcripts_df, transcripts_pdf):
    got = {
        r["docid"]: (r["n_turns"], r["first_ts"], r["last_ts"])
        for r in assemble_documents(transcripts_df).collect()
    }
    g = transcripts_pdf.groupby("conv_id")
    want_n = g.size()
    for conv_id, n in want_n.items():
        assert got[conv_id][0] == n
