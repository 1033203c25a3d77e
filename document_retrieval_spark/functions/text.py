"""Tokenization as Spark expressions — the F1/F1b/F1c/F3/F5 pipeline of
SURVEY.md §2.3, in two flavors:

1. ``tokenize_expr`` — pure built-in ``pyspark.sql.functions`` (JVM-side,
   whole-stage-codegen'd; zero Python in the hot path). This is the default
   engine tokenizer for every config expressible natively (all of them except
   lemmatize/stem).
2. ``tokenize_pandas_udf`` — Arrow-batched pandas UDF that calls the SAME
   oracle tokenizer per batch (no row-at-a-time F.udf — input_hint forbids
   per-row Python). Needed only for the nltk lemma/stem hooks
   (`bm25_ranking.ipynb cell 1:16-21`), and used in tests to prove the native
   path is token-identical.

Reference parity notes:
- punctuation delete via str.translate (`bm25_ranking.ipynb cell 1:5`)
  -> ``F.translate(text, PUNCT, "")``;
- punctuation->space + lower (`cosine_similarity_bm25_reranking.py:48-53`)
  -> ``F.translate(text, PUNCT, "   ...")`` + ``F.lower``;
- non-alnum strip (`bm25_text_preprocessing.py:43`) -> ``F.regexp_replace``;
- stopword removal keeps ORIGINAL case, compares lowercase
  (`bm25_ranking.ipynb cell 1:14`) -> higher-order ``F.filter`` with
  ``F.lower(t).isin(...)``;
- '_'-joined bigrams appended to unigrams (`cell 1:23-25`)
  -> ``F.zip_with`` over shifted slices + ``F.concat``;
- whitespace squeeze loop (`cosine_similarity_bm25_reranking.py:62-64`)
  -> single ``F.regexp_replace(text, " +", " ")``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import PUNCT, TokenizerConfig


# Java-regex class equal to PYTHON's str.split() whitespace set (the oracle
# splits with str.split()): Java \s covers ASCII [ \t\n\x0B\f\r]; Python
# additionally treats the IS1-IS4 separators (U+001C-001F), NEL (U+0085) and
# the Unicode space separators as whitespace. Without this, text containing
# NBSP / U+2028 etc. tokenizes differently engine vs oracle.
PY_WS_SPLIT = (
    "[\\s\\u001c-\\u001f\\u0085\\u00a0\\u1680"
    "\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]+"
)


def squeeze_ws(col: Column) -> Column:
    """F10: collapse repeated spaces (the reference loops .replace 10x)."""
    return F.regexp_replace(col, " +", " ")


def _normalize_expr(col: Column, cfg: TokenizerConfig) -> Column:
    if cfg.punct_mode == "delete":
        col = F.translate(col, PUNCT, "")
    elif cfg.punct_mode == "space":
        col = F.translate(col, PUNCT, " " * len(PUNCT))
    elif cfg.punct_mode == "alnum_space":
        col = F.regexp_replace(col, r"[^a-zA-Z0-9\s]", " ")
    else:  # pragma: no cover
        raise ValueError(cfg.punct_mode)
    if cfg.lowercase:
        col = F.lower(col)
    return col


def tokenize_expr(col: Column, cfg: TokenizerConfig) -> Column:
    """text column -> array<string> token column, built-ins only."""
    if cfg.lemmatize or cfg.stem_lang:
        raise ValueError("lemmatize/stem require tokenize_pandas_udf")
    if cfg.split_mode == "wordpunct":
        # F2c hermetic: nltk's wordpunct_tokenize is the regex
        # \w+|[^\w\s]+ — JVM-side via regexp_extract_all with (?U) so
        # Java's \w matches Unicode word chars like Python's re module;
        # the reference then drops tokens that are substrings of
        # string.punctuation (`team_run1.py:75`)
        src = F.lower(col) if cfg.lowercase else col
        arr = F.regexp_extract_all(
            F.coalesce(src, F.lit("")),
            F.lit(r"(?U)\w+|[^\w\s]+"),
            F.lit(0),
        )
        from ..config import PUNCT

        arr = F.filter(arr, lambda t: F.instr(F.lit(PUNCT), t) == 0)
    else:
        arr = F.split(F.trim(_normalize_expr(col, cfg)), PY_WS_SPLIT)
        arr = F.filter(arr, lambda t: t != F.lit(""))
    if cfg.stopwords:
        sw = sorted(cfg.stopword_set())
        arr = F.filter(arr, lambda t: ~F.lower(t).isin(sw))
    if cfg.bigrams:
        n = F.size(arr)
        bi = F.zip_with(
            F.slice(arr, 1, n - 1),
            F.slice(arr, 2, n - 1),
            lambda a, b: F.concat_ws("_", a, b),
        )
        arr = F.when(n >= 2, F.concat(arr, bi)).otherwise(arr)
    return arr


def tokenize_pandas_udf(cfg: TokenizerConfig):
    """Arrow-batched tokenizer UDF sharing the oracle implementation.

    Lemmatize/stem (reference `bm25_ranking.ipynb cell 1:16-21`) are applied
    here when enabled; they degrade gracefully to identity if nltk data is
    unavailable (tests marked @pytest.mark.nltk cover the real thing).
    """
    from ..oracle.bm25 import oracle_tokenize

    lemmatizer = None
    stem_fn = None
    stem_splits = False
    if cfg.stem_lang == "porter":
        # hermetic pure-Python Porter (functions/stem.py) — the reference's
        # F4c PorterStemmer path (`text_preprocessing_and_tfidf.py:29`),
        # always available, no nltk needed
        from .stem import porter_stem

        stem_fn = porter_stem
    elif cfg.stem_lang in ("korean", "ko"):
        # the reference morph-analyzes ko with konlpy's Okt
        # (`bm25_ranking.ipynb cell 1:9-10`) — use it when importable,
        # else the hermetic Hangul particle-stripping stand-in
        # (functions/korean.py); either way the per-token fn may split a
        # run, so it returns a LIST and is flattened below
        from .korean import korean_tokenize

        try:
            from konlpy.tag import Okt  # pragma: no cover (not in container)

            _okt = Okt()
            stem_fn = _okt.morphs
        except Exception:
            stem_fn = korean_tokenize
        stem_splits = True
    elif cfg.stem_lang:
        # hermetic Snowball fr/de/es/it (functions/snowball.py) — F4b, the
        # reference's SnowballStemmer path (`bm25_ranking.ipynb cell
        # 1:18-21`) without the nltk dependency; nltk below stays an
        # optional upgrade for languages this table doesn't cover
        from .snowball import SNOWBALL_STEMMERS

        stem_fn = SNOWBALL_STEMMERS.get(cfg.stem_lang)
    # independent gated imports: a missing nltk lemmatizer must not discard
    # the hermetic Porter stemmer (and vice versa)
    if cfg.lemmatize:
        try:
            from nltk.stem import WordNetLemmatizer

            _wnl = WordNetLemmatizer()
            _wnl.lemmatize("tests")  # force the wordnet data load NOW —
            # a missing corpus must fall back here, not per-row on executors
            lemmatizer = _wnl.lemmatize
        except Exception:
            # hermetic WordNet-morphy (functions/morphy.py): the F4 path no
            # longer degrades to identity when nltk/wordnet-data is absent
            from .morphy import morphy_noun

            lemmatizer = morphy_noun
    if cfg.stem_lang and stem_fn is None:
        try:
            from nltk.stem.snowball import SnowballStemmer

            stem_fn = SnowballStemmer(cfg.stem_lang).stem
        except Exception:
            stem_fn = None

    base_cfg = TokenizerConfig(
        lowercase=cfg.lowercase,
        punct_mode=cfg.punct_mode,
        split_mode=cfg.split_mode,
        stopwords=cfg.stopwords,
        bigrams=False,  # bigrams come AFTER lemma/stem, as in the reference
    )
    want_bigrams = cfg.bigrams

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        def one(text):
            toks = oracle_tokenize(text, base_cfg)
            if lemmatizer is not None:
                toks = [lemmatizer(t) for t in toks]
            if stem_fn is not None:
                if stem_splits:
                    toks = [t2 for t in toks for t2 in stem_fn(t)]
                else:
                    toks = [stem_fn(t) for t in toks]
            if want_bigrams and len(toks) >= 2:
                toks = toks + ["_".join(p) for p in zip(toks, toks[1:])]
            return toks

        return s.map(one)

    return _tok
