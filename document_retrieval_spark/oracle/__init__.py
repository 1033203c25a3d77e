from .bm25 import (  # noqa: F401
    OracleIndex,
    build_oracle_index,
    oracle_cosine_topk,
    oracle_metrics,
    oracle_tokenize,
    oracle_topk,
)
