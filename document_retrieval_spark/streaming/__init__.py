from .ingest import (  # noqa: F401
    incremental_term_stats,
    stage_turns,
    streaming_assemble_documents,
    streaming_turn_counts,
)
