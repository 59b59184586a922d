"""Otsu thresholding vs a numpy replay of the reference formulation
(tools/stats.calc_otsu_threshold, value-domain bins)."""

import numpy as np
import pytest


def numpy_otsu(vals):
    uniq = np.unique(vals)
    hist = np.array([(vals == u).sum() for u in uniq], float)
    p = hist / hist.sum()
    w1 = np.cumsum(p)
    w2 = np.cumsum(p[::-1])[::-1]
    m1 = np.cumsum(p * uniq) / w1
    m2 = (np.cumsum((p * uniq)[::-1]) / np.cumsum(p[::-1]))[::-1]
    var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    return uniq[np.argmax(var12)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_otsu_matches_reference_formula(spark, seed):
    import pandas as pd
    from rsgislib_spark.functions.thresholds import otsu_threshold

    rng = np.random.RandomState(seed)
    # bimodal: two gaussian-ish integer clusters
    vals = np.concatenate(
        [rng.randint(10, 60, 400), rng.randint(140, 220, 600)]
    ).astype(np.int64)
    df = spark.createDataFrame(pd.DataFrame({"g": 1, "v": vals}))
    out = otsu_threshold(df, "v", ["g"]).toPandas()
    assert len(out) == 1
    assert out.thres_v.iloc[0] == numpy_otsu(vals)
    assert out.n_lo.iloc[0] == (vals <= out.thres_v.iloc[0]).sum()


def test_otsu_per_group(spark):
    import pandas as pd
    from rsgislib_spark.functions.thresholds import otsu_threshold

    rng = np.random.RandomState(7)
    frames = []
    for g in range(3):
        lo = rng.randint(0, 40, 200) + g
        hi = rng.randint(150, 250, 200) - g
        frames.append(pd.DataFrame({"g": g, "v": np.concatenate([lo, hi])}))
    df = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    out = otsu_threshold(df, "v", ["g"]).toPandas().set_index("g").sort_index()
    for g in range(3):
        sub = pd.concat(frames, ignore_index=True).query("g == @g").v.to_numpy()
        assert out.loc[g, "thres_v"] == numpy_otsu(sub)
    # threshold separates the modes
    assert (out.thres_v.between(35, 150)).all()


def test_otsu_outliers_flags(spark):
    import pandas as pd
    from rsgislib_spark.functions.thresholds import otsu_outliers

    rng = np.random.RandomState(1)
    vals = np.concatenate([rng.randint(0, 30, 50), rng.randint(150, 250, 150)])
    df = spark.createDataFrame(pd.DataFrame({"g": 0, "v": vals}))
    out = otsu_outliers(df, "v", ["g"], low_tail=True).toPandas()
    t = out.thres_v.iloc[0]
    assert t == numpy_otsu(vals)
    # low-tail: exactly the values strictly below the threshold flagged 2
    assert set(out[out.chng_cls == 2].v) == set(vals[vals < t])
    assert (out[out.v >= t].chng_cls == 1).all()
    hi = otsu_outliers(df, "v", ["g"], low_tail=False).toPandas()
    assert set(hi[hi.chng_cls == 2].v) == set(vals[vals > t])
