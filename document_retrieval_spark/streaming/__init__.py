from .ingest import (  # noqa: F401
    incremental_term_stats,
    streaming_assemble_documents,
    streaming_turn_counts,
)
