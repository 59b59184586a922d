"""Accuracy metrics vs a naive numpy replay of the reference formulas
(classaccuracymetrics.calc_class_accuracy_metrics / cls_quantity_accuracy)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def metrics_pdf(spark):
    import pandas as pd
    from rsgislib_spark.functions.accuracy import class_accuracy_metrics

    rng = np.random.RandomState(3)
    ref = rng.randint(0, 4, 500)
    pred = np.where(rng.rand(500) < 0.6, ref, rng.randint(0, 4, 500))
    df = spark.createDataFrame(pd.DataFrame({"ref_cls": ref, "pred_cls": pred}))
    out = class_accuracy_metrics(df, "ref_cls", "pred_cls").toPandas()
    return ref, pred, out.set_index("class_id").sort_index()


def test_per_class_prf(metrics_pdf):
    ref, pred, out = metrics_pdf
    for c in range(4):
        tp = int(((ref == c) & (pred == c)).sum())
        sup = int((ref == c).sum())
        npred = int((pred == c).sum())
        assert out.loc[c, "support"] == sup
        assert out.loc[c, "n_pred"] == npred
        assert out.loc[c, "n_correct"] == tp
        assert out.loc[c, "precision"] == pytest.approx(tp / npred, abs=1e-6)
        assert out.loc[c, "recall"] == pytest.approx(tp / sup, abs=1e-6)
        assert out.loc[c, "f1"] == pytest.approx(2 * tp / (sup + npred), abs=1e-6)


def test_overall_and_kappa(metrics_pdf):
    ref, pred, out = metrics_pdf
    n = len(ref)
    po = (ref == pred).mean()
    pe = sum(((ref == c).sum() / n) * ((pred == c).sum() / n) for c in range(4))
    kappa = (po - pe) / (1 - pe)
    assert out["overall_accuracy"].iloc[0] == pytest.approx(po, abs=1e-6)
    assert (out["overall_accuracy"] == out["overall_accuracy"].iloc[0]).all()
    assert out["cohen_kappa"].iloc[0] == pytest.approx(kappa, abs=1e-6)


def test_pontius_quantity_allocation(metrics_pdf):
    ref, pred, out = metrics_pdf
    n = len(ref)
    # cls_area = true-class totals => norm_cm = cm / n (module docstring)
    cm = np.zeros((4, 4))
    for r, p in zip(ref, pred):
        cm[r, p] += 1
    norm = cm / n
    reft, compt = norm.sum(0), norm.sum(1)
    q = np.abs(reft - compt).sum() / 2
    commission = norm.sum(1) - np.diag(norm)
    omission = reft - np.diag(norm)
    a = (2 * np.minimum(commission, omission)).sum() / 2
    assert out["quantity_dis"].iloc[0] == pytest.approx(q, abs=1e-6)
    assert out["allocation_dis"].iloc[0] == pytest.approx(a, abs=1e-6)
    assert out["proportion_correct"].iloc[0] == pytest.approx(np.diag(norm).sum(), abs=1e-6)


def test_missing_class_sides(spark):
    import pandas as pd
    from rsgislib_spark.functions.accuracy import class_accuracy_metrics

    # class 2 never predicted; class 3 never true
    df = spark.createDataFrame(
        pd.DataFrame({"r": [0, 0, 1, 2, 2], "p": [0, 1, 1, 0, 3]})
    )
    out = class_accuracy_metrics(df, "r", "p").toPandas().set_index("class_id")
    assert out.loc[2, "n_pred"] == 0 and out.loc[2, "precision"] == 0.0
    assert out.loc[3, "support"] == 0 and out.loc[3, "recall"] == 0.0
    assert set(out.index) == {0, 1, 2, 3}
