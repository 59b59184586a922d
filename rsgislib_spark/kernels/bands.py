"""Band-math kernel library (pure numpy, vectorized).

Mirrors the reference's expression-over-bands family:
 - ``band_math`` (python/src/imagecalc.cpp:41-170): arbitrary expression
   over named bands — here a numpy callable over band arrays;
 - spectral indices (python/rsgislib/imagecalc/calcindices.py:41-723):
   ratio formulas over 2-3 bands, each a one-liner;
 - synthetic parity bands: integer-lattice band values derived from
   (image_key, px, py) with pure integer arithmetic so the identical
   formula runs as ANSI SQL in the DuckDB oracle — the decode path for
   *real* payloads lives in kernels.codecs.

All functions accept/return numpy arrays; no per-row Python anywhere.
"""

from __future__ import annotations

import numpy as np

# Moduli chosen prime so the synthetic bands decorrelate; values fit uint8
# range like the reference's TYPE_8UINT imagery.
RED_FORMULA = "(image_key * 7 + px * 13 + py * 17) % 251"
NIR_FORMULA = "(image_key * 11 + px * 5 + py * 3) % 241"


def synth_band_red(image_key, px, py) -> np.ndarray:
    k = np.asarray(image_key, dtype=np.int64)
    return (k * 7 + np.asarray(px, np.int64) * 13 + np.asarray(py, np.int64) * 17) % 251


def synth_band_nir(image_key, px, py) -> np.ndarray:
    k = np.asarray(image_key, dtype=np.int64)
    return (k * 11 + np.asarray(px, np.int64) * 5 + np.asarray(py, np.int64) * 3) % 241


def synth_band_grid(image_key: int, w: int, h: int, which: str = "red") -> np.ndarray:
    """Full (h, w) int64 band raster for one image, C-order like the
    reference's ReadAsArray."""
    py, px = np.mgrid[0:h, 0:w]
    fn = synth_band_red if which == "red" else synth_band_nir
    return fn(int(image_key), px, py)


# ---------------------------------------------------------------- indices
# Ref: imagecalc/calcindices.py — each a vectorized ratio expression.


def ndvi(red: np.ndarray, nir: np.ndarray) -> np.ndarray:
    """(nir-red)/(nir+red); 0 where the denominator is 0
    (calcindices.py:41-88 semantics with the nodata guard)."""
    red = red.astype(np.float64)
    nir = nir.astype(np.float64)
    den = nir + red
    out = np.zeros_like(den)
    nz = den != 0
    out[nz] = (nir[nz] - red[nz]) / den[nz]
    return out


def ndwi(green: np.ndarray, nir: np.ndarray) -> np.ndarray:
    return ndvi(nir, green)  # same ratio shape, (green-nir)/(green+nir)


def evi2(red: np.ndarray, nir: np.ndarray) -> np.ndarray:
    """EVI2 = 2.5 (nir-red)/(nir + 2.4 red + 1) (calcindices.py:637-689)."""
    red = red.astype(np.float64)
    nir = nir.astype(np.float64)
    return 2.5 * (nir - red) / (nir + 2.4 * red + 1.0)


def brightness(bands: list) -> np.ndarray:
    """Mean of bands (calcindices.py whiteness/brightness family)."""
    return np.mean([b.astype(np.float64) for b in bands], axis=0)


def band_stats(arr: np.ndarray) -> dict:
    """min/max/sum/count of one band — integer-exact for integer bands."""
    return {
        "n_px": int(arr.size),
        "sum_v": int(arr.sum()) if arr.dtype.kind in "iu" else float(arr.sum()),
        "min_v": arr.min().item(),
        "max_v": arr.max().item(),
    }


def rmse_sq_sum(a: np.ndarray, b: np.ndarray) -> int:
    """Sum of squared differences (integer-exact for integer bands) —
    the accumulator behind calculate_img_band_rmse (imagecalc.cpp:2030)."""
    d = a.astype(np.int64) - b.astype(np.int64)
    return int((d * d).sum())
