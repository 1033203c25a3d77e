"""--scorer auto selection rules (query/plan.py): manifest variant wins,
lang routing forces wand, the measured corpus-size crossover picks docpart
only for sparse batches on big corpora."""

from document_retrieval_spark.query.plan import DOCPART_MIN_DOCS, choose_scorer

V1 = {"idf_plus_one": True}
V3 = {"idf_plus_one": False}


def test_variant35_always_exhaustive():
    for n_q, n_d in ((1, 10**9), (5000, 100)):
        assert choose_scorer(V3, n_q, n_d, 32) == "exhaustive"
    # even when lang routing or sparse-batch rules would say otherwise
    assert choose_scorer(V3, 1, 10**9, 32, lang_col="lang") == "exhaustive"


def test_lang_routing_forces_wand():
    assert choose_scorer(V1, 1, 10**9, 32, lang_col="lang") == "wand"


def test_sparse_batch_big_corpus_picks_docpart():
    assert choose_scorer(V1, 1, DOCPART_MIN_DOCS, 32) == "docpart"
    assert choose_scorer(V1, 31, 10**8, 32) == "docpart"


def test_batch_or_small_corpus_picks_wand():
    assert choose_scorer(V1, 2000, 10**8, 32) == "wand"   # batch >= cores
    assert choose_scorer(V1, 1, DOCPART_MIN_DOCS - 1, 32) == "wand"
    assert choose_scorer(V1, 32, 10**8, 32) == "wand"
    assert choose_scorer({}, 1, 100, 8) == "wand"  # no manifest -> default
