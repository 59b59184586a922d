"""k-fold OLS via moment-sum complements vs per-fold numpy lstsq replay."""

import numpy as np
import pytest


def test_kfold_matches_per_fold_lstsq(spark):
    import hashlib

    import pandas as pd
    from pyspark.sql import functions as F
    from rsgislib_spark.functions.regression import kfold_ols_metrics

    rng = np.random.RandomState(8)
    n = 400
    f1 = rng.randint(0, 500, n).astype(np.int64)
    f2 = rng.randint(0, 500, n).astype(np.int64)
    t = 3.0 + 0.7 * f1 - 0.2 * f2 + rng.normal(0, 5, n)
    pdf = pd.DataFrame({"pt_id": np.arange(n), "f1": f1, "f2": f2, "t": t})
    out = (
        kfold_ols_metrics(
            spark.createDataFrame(pdf), ["f1", "f2"], "t", F.col("pt_id"), k=4
        )
        .toPandas()
        .set_index("fold")
        .sort_index()
    )

    # replicate fold assignment (md5 first-8-hex bucket)
    folds = np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 4 for i in range(n)]
    )
    X = np.column_stack([np.ones(n), f1, f2]).astype(float)
    for fd in range(4):
        test = folds == fd
        coef = np.linalg.lstsq(X[~test], t[~test], rcond=None)[0]
        pred = X[test] @ coef
        resid = pred - t[test]
        assert out.loc[fd, "n_test"] == test.sum()
        assert np.allclose([out.loc[fd, c] for c in ("a0", "a1", "a2")], coef, atol=1e-6)
        assert out.loc[fd, "rmse"] == pytest.approx(np.sqrt((resid**2).mean()), abs=1e-6)
        assert out.loc[fd, "bias"] == pytest.approx(resid.mean(), abs=1e-6)
        sstot = ((t[test] - t[test].mean()) ** 2).sum()
        assert out.loc[fd, "r2"] == pytest.approx(
            1 - (resid**2).sum() / sstot, abs=1e-6
        )
        assert out.loc[fd, "norm_bias"] == pytest.approx(
            100 * resid.mean() / t[test].mean(), abs=1e-5
        )


def test_kfold_requires_two_features(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from rsgislib_spark.functions.regression import kfold_ols_metrics

    df = spark.createDataFrame(pd.DataFrame({"pt_id": [1], "f1": [1.0], "t": [2.0]}))
    with pytest.raises(ValueError):
        kfold_ols_metrics(df, ["f1"], "t", F.col("pt_id"))
