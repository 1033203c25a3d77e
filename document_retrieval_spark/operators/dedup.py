"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's capability surface (its only dedup is
drop_duplicates on query rows, `team_run1.py:142`, and a duplicate-id audit,
`debug.py:8-14`), these are the corpus-curation operators a 100 TB pipeline
needs. All are pure DataFrame compositions (joins + hash aggs — no UDFs), and
every hash is DETERMINISTIC INTEGER ARITHMETIC over a sorted term dictionary,
so a DuckDB SQL oracle reproduces results bit-for-bit:

- exact_dedup:        md5(text) group, keep min doc_id (hash-groupBy dedup)
- shingles:           word k-gram sets per doc
- minhash_signatures: R universal hashes h_r(x) = (a_r*x + b_r) mod p over
                      dictionary-encoded shingle ids, min per doc
- lsh_candidate_pairs: band the signature, bucket-join, verify exact Jaccard
- ngram_jaccard_pairs: exact Jaccard over shingle sets for co-shingled pairs
- simhash_signatures: 64-bit sign-aggregated fingerprint as a bit string

Scale notes:
- the shingle dictionary uses a global row_number over sorted distinct
  shingles — deterministic ids shared with the oracle. At 10^9+ distinct
  shingles swap in zipWithIndex ordinals (operators/postings.py pattern);
  determinism is what the correctness harness needs, the engine only needs
  density.
- LSH verification joins only docs sharing a band bucket (the whole point:
  candidate generation is O(collisions), not O(n^2)); ngram_jaccard_pairs is
  the exact quadratic-ish baseline, bounded by co-occurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 2^61 - 1 (Mersenne prime) — universal-hash modulus; all arithmetic stays
# within int64 as long as a_r * max_id + b_r < 2^63.
MERSENNE61 = (1 << 61) - 1


def hash_params(r: int) -> tuple[int, int]:
    """Deterministic (a_r, b_r) for minhash round r — small enough that
    a_r * shingle_id fits int64 for dictionaries up to ~9e12 ids."""
    return 1_000_003 * (r + 1) + 12_345, 7_919 * (r + 1) + 104_729


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the smallest id per identical text -> (doc_id, n_dupes)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("n_dupes"),
        )
        .select(id_col, "n_dupes")
    )


def shingles(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, shingle) DISTINCT word k-grams (lowercased whitespace
    tokens, '_'-joined — the F5 bigram mechanism generalized to k)."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != F.lit("")
    )
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.array_join(F.slice(toks, i + 1, k), "_"),
    )
    sh = F.when(n >= k, sh).otherwise(F.array())
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def shingle_dictionary(sh: DataFrame) -> DataFrame:
    """-> (shingle, sid) dense ids, deterministic: row_number over sorted
    distinct shingles (ties impossible). The SQL oracle uses the identical
    rule, so ids — and therefore every hash downstream — agree exactly."""
    w = Window.orderBy("shingle")
    return (
        sh.select("shingle")
        .distinct()
        .withColumn("sid", F.row_number().over(w).cast("bigint"))
    )


def minhash_signatures(
    sh: DataFrame, dictionary: DataFrame, n_hashes: int = 16
) -> DataFrame:
    """-> (doc_id, r, minh) long-form signature, r in [0, n_hashes)."""
    ids = sh.join(dictionary, "shingle").select("doc_id", "sid")
    rounds = [
        F.struct(
            F.lit(r).alias("r"),
            (
                (
                    F.lit(a).cast("bigint") * F.col("sid").cast("bigint")
                    + F.lit(b).cast("bigint")
                )
                % F.lit(MERSENNE61)
            ).alias("h"),
        )
        for r, (a, b) in ((r, hash_params(r)) for r in range(n_hashes))
    ]
    exploded = ids.select(
        "doc_id", F.explode(F.array(*rounds)).alias("rh")
    ).select("doc_id", F.col("rh.r").alias("r"), F.col("rh.h").alias("h"))
    return exploded.groupBy("doc_id", "r").agg(F.min("h").alias("minh"))


def lsh_bands(signatures: DataFrame, rows_per_band: int = 4) -> DataFrame:
    """-> (doc_id, band, band_key) — band_key is the ordered concat of the
    band's minhash values (string form: portable across engines)."""
    banded = signatures.withColumn("band", (F.col("r") / rows_per_band).cast("int"))
    return banded.groupBy("doc_id", "band").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("r", "minh"))),
                lambda s: s["minh"].cast("string"),
            ),
            ",",
        ).alias("band_key")
    )


def jaccard_pairs(sh: DataFrame, candidates: DataFrame | None = None) -> DataFrame:
    """Exact Jaccard for doc pairs sharing >=1 shingle (optionally restricted
    to candidate pairs) -> (doc_a, doc_b, jaccard)."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    if candidates is not None:
        common = common.join(candidates, ["doc_a", "doc_b"], "leftsemi")
    return (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a")
                    .withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
                6,
            ),
        )
        .select("doc_a", "doc_b", "jaccard")
    )


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Docs sharing any band bucket -> distinct (doc_a, doc_b)."""
    l = bands.select("band", "band_key", F.col("doc_id").alias("doc_a"))
    r = bands.select("band", "band_key", F.col("doc_id").alias("doc_b"))
    return (
        l.join(r, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_near_dupes(
    docs: DataFrame,
    k: int = 3,
    n_hashes: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash+LSH pipeline: shingle -> sign -> band -> bucket-join ->
    verify -> (doc_a, doc_b, jaccard >= threshold)."""
    sh = shingles(docs, k=k)
    dictionary = shingle_dictionary(sh)
    sig = minhash_signatures(sh, dictionary, n_hashes=n_hashes)
    cand = lsh_candidate_pairs(lsh_bands(sig, rows_per_band))
    return jaccard_pairs(sh, cand).filter(F.col("jaccard") >= threshold)


def simhash_signatures(sh_tf: DataFrame, dictionary: DataFrame, bits: int = 64) -> DataFrame:
    """SimHash over dictionary-encoded features -> (doc_id, simhash) where
    simhash is a `bits`-char '0'/'1' string (bit b = sign of the tf-weighted
    sum of feature-hash bit b). String output keeps it engine-portable.

    sh_tf: (doc_id, shingle, tf) — weighted features.
    """
    a, b = hash_params(97)
    ids = sh_tf.join(dictionary, "shingle").select(
        "doc_id",
        "tf",
        (
            (
                F.lit(a).cast("bigint") * F.col("sid").cast("bigint")
                + F.lit(b).cast("bigint")
            )
            % F.lit(MERSENNE61)
        ).alias("h"),
    )
    bit = ids.select(
        "doc_id",
        "tf",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bpos"),
        "h",
    ).withColumn(
        # (h >> bpos) & 1 mapped to +-1, tf-weighted; F.shiftright only takes
        # a literal shift in the Python API, so use the SQL form
        "contrib",
        F.expr("tf * ((shiftright(h, cast(bpos as int)) & 1) * 2 - 1)"),
    )
    agg = bit.groupBy("doc_id", "bpos").agg(F.sum("contrib").alias("s"))
    return agg.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bpos", "s"))),
                lambda x: F.when(x["s"] > 0, "1").otherwise("0"),
            ),
            "",
        ).alias("simhash")
    )
