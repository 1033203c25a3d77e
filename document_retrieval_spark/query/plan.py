"""Physical-scorer selection (`--scorer auto`): encode the measured layout
crossover so the default is the right plan without operator knowledge.

The engine has three scorers over a built index:
  wand        per-query block-max WAND — parallelizes ACROSS queries;
              best batch throughput (BENCH.md: 47 q/s at sf0.1).
  docpart     doc-range-partitioned WAND — fans ONE query across cores;
              wins single-/few-query latency once the corpus is large
              enough that one core's WAND pass dominates (measured
              crossover ~10^6 turns: max latency 5,326 -> 1,464 ms,
              BENCH.md §crossover).
  exhaustive  join scorer over the staged tf table — the ONLY valid scorer
              for variant-3/5 indexes (idf_plus_one=False goes negative,
              which would turn WAND's upper bounds into lower bounds).
"""

from __future__ import annotations

# measured crossover corpus size (turns/docs) above which the docpart
# layout's fan-out beats a single core's WAND pass for a sparse batch
DOCPART_MIN_DOCS = 500_000


def choose_scorer(
    bm25_fingerprint: dict,
    n_queries: int,
    n_docs: int,
    parallelism: int,
    lang_col: str | None = None,
) -> str:
    """-> 'wand' | 'docpart' | 'exhaustive'.

    Rules, in order:
    1. idf_plus_one=False (BM25 variants 3/5) -> exhaustive — correctness,
       not performance (query/wand.py refuses negative idf).
    2. language-routed batches -> wand (docpart routes on GLOBAL ordinals).
    3. sparse batch on a big corpus (fewer queries than cores, corpus past
       the measured crossover) -> docpart: per-query parallelism would
       leave most cores idle and p95 = one core's full WAND pass.
    4. otherwise -> wand: batches >= cores saturate the cluster with the
       cheapest layout (shared theta, no segment replication).
    """
    if bm25_fingerprint.get("idf_plus_one") is False:
        return "exhaustive"
    if lang_col:
        return "wand"
    if n_queries < parallelism and n_docs >= DOCPART_MIN_DOCS:
        return "docpart"
    return "wand"
