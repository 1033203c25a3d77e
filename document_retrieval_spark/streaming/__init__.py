from .ingest import incremental_term_stats, streaming_turn_counts  # noqa: F401
