"""Spectral unmixing: UCLS exact reconstruction, NNLS KKT certificate."""

import numpy as np
import pytest

from rsgislib_spark.functions.unmixing import (
    fcls_sum_to_one,
    nnls_unmix_kernel,
    ucls_matrix,
    ucls_unmix,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nnls_kkt_certificate(seed):
    rng = np.random.RandomState(seed)
    E = rng.uniform(0, 10, (3, 6))
    A_true = np.clip(rng.uniform(-0.3, 1.0, (400, 3)), 0, None)
    X = A_true @ E + rng.normal(0, 0.1, (400, 6))
    a = nnls_unmix_kernel(X, E)
    assert (a >= 0).all()
    G = E @ E.T
    grad = a @ G - X @ E.T
    active = a > 1e-10
    # KKT: zero gradient on the support, non-negative elsewhere
    assert np.abs(grad[active]).max() < 1e-8
    assert grad[~active].min() > -1e-8


def test_ucls_exact_on_pure_mixtures():
    rng = np.random.RandomState(4)
    E = rng.uniform(0, 10, (3, 6))
    A = np.clip(rng.uniform(0, 1.0, (100, 3)), 0, None)
    U = ucls_matrix(E)
    assert np.allclose(U @ (A @ E).T, A.T, atol=1e-9)


def test_nnls_matches_ucls_when_interior():
    rng = np.random.RandomState(5)
    E = rng.uniform(1, 10, (2, 4))
    A = rng.uniform(0.2, 1.0, (50, 2))  # strictly positive abundances
    X = A @ E
    assert np.allclose(nnls_unmix_kernel(X, E), (ucls_matrix(E) @ X.T).T, atol=1e-8)


def test_nnls_k_cap():
    with pytest.raises(ValueError):
        nnls_unmix_kernel(np.zeros((1, 20)), np.eye(13, 20))


def test_fcls_projection():
    a = np.array([[0.5, 0.7, -0.1], [0.0, 0.0, 0.0], [2.0, 2.0, 0.0]])
    f = fcls_sum_to_one(a)
    assert np.allclose(f[0].sum(), 1.0) and (f >= 0).all()
    assert np.allclose(f[1], 0.0)  # all-zero rows stay zero
    assert np.allclose(f[2], [0.5, 0.5, 0.0])


def test_ucls_unmix_catalyst(spark):
    import pandas as pd

    rng = np.random.RandomState(7)
    E = np.array([[3.0, 1.0], [1.0, 4.0]])
    A = rng.uniform(0, 1, (60, 2))
    X = A @ E
    df = spark.createDataFrame(pd.DataFrame({"b1": X[:, 0], "b2": X[:, 1]}))
    out = ucls_unmix(df, ["b1", "b2"], E).toPandas()
    assert np.allclose(out[["ab1", "ab2"]].to_numpy(), A, atol=1e-8)
