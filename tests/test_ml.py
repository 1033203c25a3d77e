"""V4 (PCA) / V7 (logistic regression) Spark-ML wrapper tests: shape,
determinism, basis-consistency, and a NumPy gradient-descent differential
twin of the reference's logreg (`text_preprocessing_and_tfidf.py:112-138`)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from document_retrieval_spark.operators.ml import (
    logreg_fit,
    logreg_predict,
    pca_reduce,
    pca_transform,
)

SF_DIR = "/root/testdata/sf0.001"
K = 8


@pytest.fixture(scope="module", autouse=True)
def _fresh_cache(spark):
    # Spark-ML fits are iterative jobs in the long-lived shared test JVM;
    # drop leftover cached tables from earlier modules so the LBFGS run
    # isn't competing with stale persists for executor memory.
    spark.catalog.clearCache()
    yield


@pytest.fixture(scope="module")
def vectors(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )


def _as_np(rows, col):
    return {r["vec_id"]: np.asarray(r[col], dtype=np.float64) for r in rows}


def test_pca_shape_determinism_and_unit_norm(vectors):
    red1, m1 = pca_reduce(vectors, K)
    red2, m2 = pca_reduce(vectors, K)
    a, b = _as_np(red1.collect(), "reduced"), _as_np(red2.collect(), "reduced")
    assert len(a) == vectors.count()
    assert all(v.shape == (K,) for v in a.values())
    # deterministic: Gramian + driver eigensolve — two fits identical
    for vid in a:
        np.testing.assert_array_equal(a[vid], b[vid])
    # L2-normalized (the faiss.normalize_L2 analog)
    for v in a.values():
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9


def test_pca_projection_matches_numpy_subspace(vectors):
    """Spark-ML PCA derives components from the CENTERED covariance but
    transforms the raw (uncentered) vectors — replicate exactly that with a
    NumPy eigendecomposition twin; columns match up to eigenvector sign."""
    red, model = pca_reduce(vectors, K, normalize=False)
    rows = vectors.orderBy("vec_id").collect()
    X = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    Xc = X - X.mean(axis=0)
    cov = (Xc.T @ Xc) / (len(X) - 1)
    evals, evecs = np.linalg.eigh(cov)
    V = evecs[:, np.argsort(evals)[::-1][:K]]
    proj_np = X @ V
    got = _as_np(red.collect(), "reduced")
    proj_spark = np.vstack([got[r["vec_id"]] for r in rows])
    for j in range(K):
        a, b = proj_spark[:, j], proj_np[:, j]
        if np.dot(a, b) < 0:
            b = -b
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-8)


def test_pca_query_side_uses_same_basis(vectors):
    """Queries must be projected with the FITTED model
    (`faiss_based_ANN_Implementation.py:292-299`): transforming a subset
    with the returned model equals the full-fit output rows."""
    red, model = pca_reduce(vectors, K)
    sub = vectors.filter(F.col("vec_id") < 10)
    got = _as_np(pca_transform(sub, model).collect(), "reduced")
    full = _as_np(red.filter(F.col("vec_id") < 10).collect(), "reduced")
    for vid in got:
        np.testing.assert_allclose(got[vid], full[vid], rtol=0, atol=1e-12)


@pytest.fixture(scope="module")
def labeled(vectors):
    # binary target from the testdata's label column (0-9 -> {0,1})
    return vectors.select(
        "vec_id",
        F.col("embedding").alias("features"),
        (F.col("label") >= 5).cast("int").alias("y"),
    )


def test_logreg_matches_reference_gd_twin(labeled):
    """Spark-ML LBFGS at regParam=0 and the reference's full-batch GD
    minimize the same strictly-convex objective: probabilities agree to
    optimizer tolerance."""
    model = logreg_fit(labeled, features_col="features", label_col="y")
    probs = {
        r["vec_id"]: r["prob"]
        for r in logreg_predict(labeled, model, features_col="features").collect()
    }
    rows = labeled.orderBy("vec_id").collect()
    X = np.vstack([np.asarray(r["features"], dtype=np.float64) for r in rows])
    y = np.array([r["y"] for r in rows], dtype=np.float64)
    # the reference's logistic_regression_fit, run long enough to converge
    # (`text_preprocessing_and_tfidf.py:112-131`)
    w, b = np.zeros(X.shape[1]), 0.0
    n = len(y)
    for _ in range(20000):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        w -= 1.0 * (X.T @ (p - y)) / n
        b -= 1.0 * float(np.sum(p - y)) / n
    p_ref = 1.0 / (1.0 + np.exp(-(X @ w + b)))
    p_spark = np.array([probs[r["vec_id"]] for r in rows])
    np.testing.assert_allclose(p_spark, p_ref, atol=5e-3)
    # and the decision boundary agrees on confident examples
    conf = np.abs(p_ref - 0.5) > 0.05
    assert np.array_equal(p_spark[conf] > 0.5, p_ref[conf] > 0.5)


def test_logreg_deterministic(labeled):
    m1 = logreg_fit(labeled, features_col="features", label_col="y")
    m2 = logreg_fit(labeled, features_col="features", label_col="y")
    np.testing.assert_array_equal(
        m1.coefficients.toArray(), m2.coefficients.toArray()
    )
    assert m1.intercept == m2.intercept


def test_pca_then_ann_reference_flow(vectors):
    """The reference's V4 flow end-to-end: reduce -> normalize -> inner-
    product top-k (`faiss_based_ANN_Implementation.py:269-299`). On unit
    vectors IP == cosine, so the engine's brute-force cosine operator over
    the reduced table is the IndexFlatIP twin."""
    from document_retrieval_spark.operators.similarity import (
        brute_force_cosine_topk,
    )

    red, model = pca_reduce(vectors, K)
    base = red.select("vec_id", F.col("reduced").alias("embedding"))
    probes = pca_transform(
        vectors.filter(F.col("vec_id") < 3), model
    ).select(F.col("vec_id").alias("probe_id"), F.col("reduced").alias("embedding"))
    got = brute_force_cosine_topk(base, probes, k=5).collect()
    assert {r["probe_id"] for r in got} == {0, 1, 2}
    assert all(len([x for x in got if x["probe_id"] == p]) == 5 for p in (0, 1, 2))


def test_logreg_predict_dimension_mismatch_raises(spark):
    """r4 ADVICE (ml.py:145): zip_with null-pads on a feature-array length
    mismatch, which previously surfaced as a silently-NULL prob; it must
    fail loudly like pyspark.ml's transform would."""
    import pandas as pd
    import pytest as _pytest

    from document_retrieval_spark.operators.ml import logreg_fit, logreg_predict

    train = spark.createDataFrame(pd.DataFrame({
        "vec_id": list(range(8)),
        "features": [[float(i), float(i % 2)] for i in range(8)],
        "label": [i % 2 for i in range(8)],
    }))
    model = logreg_fit(train)
    ok = logreg_predict(train, model).collect()
    assert all(r["prob"] is not None for r in ok)
    bad = spark.createDataFrame(pd.DataFrame({
        "vec_id": [0],
        "features": [[1.0, 2.0, 3.0]],  # dim 3 vs model dim 2
    }))
    with _pytest.raises(Exception) as ei:
        logreg_predict(bad, model).collect()
    assert "dimension" in str(ei.value)
