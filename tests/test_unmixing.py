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


def test_fcls_exact_kkt_certified():
    """fcls_unmix_kernel output satisfies the FCLS KKT conditions:
    simplex-feasible, gradient equal on the support (= -lambda), and
    gradient >= -lambda off-support (nonneg multipliers)."""
    import numpy as np
    from rsgislib_spark.functions.unmixing import fcls_unmix_kernel

    rng = np.random.RandomState(42)
    E = np.array([[120.0, 30.0, 60.0], [40.0, 200.0, 100.0], [20.0, 60.0, 180.0]])
    X = rng.rand(300, 3) * 300
    A = fcls_unmix_kernel(X, E)
    assert (A >= -1e-9).all()
    assert np.allclose(A.sum(1), 1.0, atol=1e-9)
    G = 2.0 * (A @ E - X) @ E.T  # gradient wrt a
    for i in range(len(X)):
        sup = A[i] > 1e-8
        lam = -G[i][sup]
        assert np.ptp(lam) < 1e-6  # equal gradient on support
        if (~sup).any():
            assert (G[i][~sup] >= lam.mean() * -1 - 1e-6).all()


def test_fcls_interior_matches_closed_form():
    """For x strictly inside the endmember simplex, FCLS returns the
    exact barycentric coordinates (residual 0)."""
    import numpy as np
    from rsgislib_spark.functions.unmixing import fcls_unmix_kernel

    E = np.array([[120.0, 30.0, 60.0], [40.0, 200.0, 100.0], [20.0, 60.0, 180.0]])
    w = np.array([[0.5, 0.3, 0.2], [0.1, 0.1, 0.8]])
    X = w @ E
    A = fcls_unmix_kernel(X, E)
    assert np.allclose(A, w, atol=1e-9)
    assert np.allclose(X - A @ E, 0.0, atol=1e-9)
