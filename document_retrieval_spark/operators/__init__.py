from .assemble import assemble_documents  # noqa: F401
from .stats import build_term_stats, tokenize_documents  # noqa: F401
from .topk import topk_per_group  # noqa: F401
