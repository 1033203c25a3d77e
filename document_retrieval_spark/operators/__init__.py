from .assemble import assemble_documents  # noqa: F401
from .stats import (  # noqa: F401
    build_term_stats,
    term_frequencies_from_turns,
    tokenize_documents,
)
from .topk import topk_per_group  # noqa: F401
