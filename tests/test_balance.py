"""Class-balancing sampling: imblearn-equivalent semantics, deterministic."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def skewed(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {"id": np.arange(200), "cls": np.repeat([0, 1, 2], [120, 60, 20])}
    )
    return spark.createDataFrame(pdf)


def test_undersample_to_minority(skewed):
    from pyspark.sql import functions as F
    from rsgislib_spark.functions.sampling import undersample_balanced

    out = undersample_balanced(skewed, "cls", F.col("id")).toPandas()
    counts = out.groupby("cls").size()
    assert (counts == 20).all()
    # deterministic: repeat gives the identical selection
    out2 = undersample_balanced(skewed, "cls", F.col("id")).toPandas()
    assert sorted(out.id) == sorted(out2.id)
    # class-2 rows are all kept (it IS the minority)
    assert set(out[out.cls == 2].id) == set(range(180, 200))


def test_oversample_to_majority(skewed):
    from pyspark.sql import functions as F
    from rsgislib_spark.functions.sampling import oversample_balanced

    out = oversample_balanced(skewed, "cls", F.col("id")).toPandas()
    counts = out.groupby("cls").size()
    assert (counts == 120).all()
    # majority class is untouched (each row exactly once)
    assert out[out.cls == 0].id.value_counts().max() == 1
    # minority rows replicated 6x each (120/20 exact)
    assert (out[out.cls == 2].id.value_counts() == 6).all()
    # class 1: 120/60 = 2 each, no remainder
    assert (out[out.cls == 1].id.value_counts() == 2).all()


def test_oversample_remainder_distribution(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from rsgislib_spark.functions.sampling import oversample_balanced

    df = spark.createDataFrame(
        pd.DataFrame({"id": range(10), "cls": [0] * 7 + [1] * 3})
    )
    out = oversample_balanced(df, "cls", F.col("id")).toPandas()
    vc = out[out.cls == 1].id.value_counts()
    assert vc.sum() == 7  # 3 rows -> 7 total: reps 3/2/2
    assert sorted(vc.tolist()) == [2, 2, 3]


def test_smote_deterministic_and_in_hull():
    from rsgislib_spark.functions.sampling import smote_oversample

    rng = np.random.RandomState(2)
    X = np.vstack([rng.normal(0, 1, (50, 2)), rng.normal(8, 1, (12, 2))])
    y = np.array([0] * 50 + [1] * 12)
    s1 = smote_oversample(X, y, 1, k=3, n_synth=40)
    s2 = smote_oversample(X, y, 1, k=3, n_synth=40)
    assert np.array_equal(s1, s2)
    # synthetic points live between minority samples, near the minority mode
    assert np.all(s1.min(0) >= X[y == 1].min(0) - 1e-9)
    assert np.all(s1.max(0) <= X[y == 1].max(0) + 1e-9)
    with pytest.raises(ValueError):
        smote_oversample(X, y, 1, k=12, n_synth=5)
