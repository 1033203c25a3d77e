"""V4/V7 (SURVEY §2.8): dimensionality reduction + logistic regression as
thin Spark-ML wrappers over the engine's array<float> embedding columns.

Reference semantics re-expressed (NOT ported):
- V4 `faiss_based_ANN_Implementation.py:269-280`: TruncatedSVD(256) over the
  tf-idf doc vectors, the reduced vectors L2-normalized and pushed into an
  inner-product FAISS index. Here: `pyspark.ml.feature.PCA` fit/transform
  over a Vector column (distributed Gramian + driver-side eigensolve inside
  Spark ML — the same shape a 100 TB run needs: only the d x d Gramian ever
  leaves the executors), followed by the same L2 normalization. PCA centers
  the data where TruncatedSVD does not — the one semantic difference, noted
  in the docstring of `pca_reduce` and irrelevant to cosine/IP ranking after
  the normalize step for zero-mean-ish embeddings.
- V7 `text_preprocessing_and_tfidf.py:112-138`: full-batch gradient descent
  on unregularized logistic regression with bias. Here:
  `pyspark.ml.classification.LogisticRegression` (LBFGS) with regParam=0,
  standardization off, intercept on — the same strictly-convex optimum, so
  probabilities agree with the reference's GD to optimizer tolerance
  (differential-tested vs a NumPy GD twin in tests/test_ml.py).

Both wrappers keep arrays at the API boundary (array<float|double> in,
array<double>/double out) so the rest of the engine never sees Spark-ML
Vector types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _as_vector(df: DataFrame, col: str, out: str):
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(out, array_to_vector(F.col(col).cast("array<double>")))


def pca_reduce(
    vectors: DataFrame,   # (id_col, emb_col: array<float|double>)
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    normalize: bool = True,
):
    """Fit PCA(k) and project -> (df(id_col, reduced: array<double>), model).

    `normalize=True` L2-normalizes the reduced vectors, mirroring
    `faiss.normalize_L2(doc_vectors_reduced)`
    (`faiss_based_ANN_Implementation.py:278-280`) so inner product ==
    cosine downstream. Deterministic for a fixed input: the fit reduces to
    a d x d Gramian (executor-side tree-aggregated) + a driver eigensolve;
    tests assert two fits produce identical components. Note PCA centers
    the data (reference's TruncatedSVD does not) — for ranking this only
    shifts the origin before the normalize.

    Returns the fitted model too so query vectors can be projected into the
    SAME basis (the reference transforms queries with the fitted `svd`,
    `faiss_based_ANN_Implementation.py:292-299`).
    """
    from pyspark.ml.feature import PCA

    src = _as_vector(vectors, emb_col, "_features")
    model = PCA(k=k, inputCol="_features", outputCol="_reduced").fit(src)
    out = pca_transform(vectors, model, id_col, emb_col, normalize)
    return out, model


def pca_transform(
    vectors: DataFrame,
    model,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Project with an already-fitted PCA model (query-side path)."""
    from pyspark.ml.functions import vector_to_array

    src = _as_vector(vectors, emb_col, "_features")
    red = model.transform(src).withColumn(
        "reduced", vector_to_array(F.col("_reduced"))
    )
    if normalize:
        nrm = F.sqrt(
            F.aggregate(
                F.col("reduced"), F.lit(0.0), lambda a, x: a + x * x
            )
        )
        red = red.withColumn(
            "reduced",
            F.when(
                nrm > 0.0,
                F.transform(F.col("reduced"), lambda x: x / nrm),
            ).otherwise(F.col("reduced")),
        )
    return red.select(id_col, "reduced")


def logreg_fit(
    train: DataFrame,     # (features: array<float|double>, label: 0/1)
    features_col: str = "features",
    label_col: str = "label",
    max_iter: int = 200,
):
    """Fit unregularized binary logistic regression with intercept — the
    reference's GD objective (`text_preprocessing_and_tfidf.py:112-131`:
    regularization-free, bias term, sigmoid probabilities) solved by Spark
    ML's distributed LBFGS instead of 1000 driver-side epochs. Returns the
    fitted model."""
    from pyspark.ml.classification import LogisticRegression

    src = _as_vector(train, features_col, "_features").withColumn(
        "_label", F.col(label_col).cast("double")
    )
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol="_label",
        maxIter=max_iter,
        regParam=0.0,
        elasticNetParam=0.0,
        standardization=False,
        fitIntercept=True,
        tol=1e-10,
    )
    return lr.fit(src)


def logreg_predict(
    df: DataFrame,
    model,
    features_col: str = "features",
    id_col: str = "vec_id",
) -> DataFrame:
    """-> (id_col, prob: double) — P(label=1), the reference's `predict`
    sigmoid output (`text_preprocessing_and_tfidf.py:133-138`).

    Scoring is pure column math over the fitted coefficients
    (sigmoid(x·w + b) via zip_with/aggregate, whole-stage codegen) rather
    than `model.transform`: identical numbers for binary LR, no Vector
    round-trip on the hot path, and it sidesteps a Spark 4.1 quirk where
    LogisticRegressionModel.transform's prediction closure drags the
    session's ObservationManager into task serialization whenever any
    `df.observe` ran earlier in the session (the IndexBuilder's metrics
    do exactly that)."""
    w = [float(c) for c in model.coefficients]
    b = float(model.intercept)
    feats = F.col(features_col).cast("array<double>")
    dot = F.aggregate(
        F.zip_with(
            feats,
            F.array(*[F.lit(c) for c in w]),
            lambda x, c: x * c,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-(dot + F.lit(b))))
    # zip_with null-pads on length mismatch, which would surface as a
    # silently-NULL prob; fail loudly instead, matching pyspark.ml's
    # transform behavior on a dimension mismatch (r4 ADVICE, ml.py:145)
    guarded = F.when(F.size(feats) == F.lit(len(w)), prob).otherwise(
        F.raise_error(F.concat(
            F.lit(f"logreg_predict: feature dimension != model dim {len(w)}: "),
            F.size(feats).cast("string"),
        )).cast("double")
    )
    return df.select(id_col, guarded.alias("prob"))
