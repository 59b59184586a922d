"""Leung-Malik filter bank: structural properties + oriented response."""

import numpy as np
import pytest

from rsgislib_spark.kernels.filterbank import apply_bank, lm_filter_bank, texture_features


@pytest.fixture(scope="module")
def bank():
    return lm_filter_bank(sup=25)


def test_bank_shape_and_normalization(bank):
    assert bank.shape == (48, 25, 25)
    # oriented + LoG filters are zero-mean, L1-normalized
    for i in range(44):
        assert abs(bank[i].sum()) < 1e-10
        assert np.abs(bank[i]).sum() == pytest.approx(1.0)
    # gaussians sum to 1
    for i in range(44, 48):
        assert bank[i].sum() == pytest.approx(1.0)
        assert (bank[i] >= 0).all()


def test_edge_filter_orientation_selectivity(bank):
    """A vertical step edge responds most strongly to the edge filter
    whose orientation matches (filters 0..5 = 1st-deriv at 6 angles,
    scale sqrt(2))."""
    img = np.zeros((41, 41))
    img[:, 20:] = 100.0
    resp = np.abs(apply_bank(img, bank[:6]))
    center = resp[:, resp.shape[1] // 2, resp.shape[2] // 2]
    # derivative runs along the rotated y-axis: angle π/2 (index 3)
    # differentiates along x — the vertical-edge responder
    assert center.argmax() == 3
    assert center[3] > 3 * center[0]  # ~perpendicular orientation much weaker


def test_constant_image_zero_response(bank):
    img = np.full((30, 30), 77.0)
    resp = apply_bank(img, bank[:44])
    assert np.abs(resp).max() < 1e-8
    g = apply_bank(img, bank[44:])
    assert np.allclose(g, 77.0)  # gaussians reproduce the constant


def test_texture_features_discriminate(bank):
    rng = np.random.Generator(np.random.Philox(key=[31, 0]))
    smooth = np.cumsum(rng.normal(0, 1, (40, 40)), axis=1)
    noisy = rng.normal(0, 30, (40, 40))
    fs = texture_features(smooth, bank)
    fn = texture_features(noisy, bank)
    assert fs.shape == (48,)
    # high-frequency content responds far more to the bar/edge filters
    assert fn[:36].mean() > 3 * fs[:36].mean()
