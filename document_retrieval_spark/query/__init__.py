from .bm25 import bm25_score_exhaustive, prepare_query_terms  # noqa: F401
from .cosine import cosine_topk  # noqa: F401
from .metrics import recall_mrr  # noqa: F401
from .plan import choose_scorer  # noqa: F401
