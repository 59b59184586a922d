"""Affine warp fit vs numpy lstsq, with exact recovery on noiseless input."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tie_df(spark):
    import pandas as pd

    rng = np.random.RandomState(6)
    x = rng.uniform(0, 1000, 300)
    y = rng.uniform(0, 1000, 300)
    tx = 5.5 + 1.02 * x - 0.03 * y + rng.normal(0, 2.0, 300)
    ty = -12.0 + 0.015 * x + 0.98 * y + rng.normal(0, 2.0, 300)
    pdf = pd.DataFrame({"x": x, "y": y, "tx": tx, "ty": ty})
    return pdf, spark.createDataFrame(pdf)


def test_affine_fit_matches_lstsq(tie_df):
    from rsgislib_spark.functions.warpfit import affine_fit

    pdf, df = tie_df
    m = affine_fit(df, "x", "y", "tx", "ty")
    X = np.column_stack([np.ones(len(pdf)), pdf.x, pdf.y])
    want_a, res_a = np.linalg.lstsq(X, pdf.tx, rcond=None)[:2]
    want_b, res_b = np.linalg.lstsq(X, pdf.ty, rcond=None)[:2]
    assert np.allclose(m.a, want_a, atol=1e-7)
    assert np.allclose(m.b, want_b, atol=1e-7)
    assert m.rmse_x == pytest.approx(float(np.sqrt(res_a[0] / len(pdf))), abs=1e-7)
    assert m.rmse_y == pytest.approx(float(np.sqrt(res_b[0] / len(pdf))), abs=1e-7)


def test_affine_apply_residuals(tie_df):
    from rsgislib_spark.functions.warpfit import affine_apply, affine_fit

    pdf, df = tie_df
    m = affine_fit(df, "x", "y", "tx", "ty")
    out = affine_apply(df, m, "x", "y").toPandas()
    rmse = float(np.sqrt(((out.warp_x - out.tx) ** 2).mean()))
    assert rmse == pytest.approx(m.rmse_x, abs=1e-7)
    assert rmse < 3.0  # noise sigma was 2


def test_affine_fit_exact_on_noiseless(spark):
    import pandas as pd
    from rsgislib_spark.functions.warpfit import affine_fit

    x = np.arange(50, dtype=float)
    y = (np.arange(50, dtype=float) * 3) % 17
    pdf = pd.DataFrame({"x": x, "y": y, "tx": 2.0 + 3.0 * x - 0.5 * y, "ty": 1.0 - x + 2.0 * y})
    m = affine_fit(spark.createDataFrame(pdf), "x", "y", "tx", "ty")
    assert np.allclose(m.a, [2.0, 3.0, -0.5], atol=1e-9)
    assert np.allclose(m.b, [1.0, -1.0, 2.0], atol=1e-9)
    assert m.rmse_x == pytest.approx(0.0, abs=1e-9)
    assert m.rmse_y == pytest.approx(0.0, abs=1e-9)
