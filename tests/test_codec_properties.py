"""Property-based codec tests (hypothesis): lossless roundtrips for
raw/png on arbitrary arrays, PSNR ≥ 40 dB for the jpeg-class codec on
smooth content (the BASELINE.json per-row invariant), phash stability."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rsgislib_spark.kernels import codecs
from rsgislib_spark.kernels.phash import phash64

dims = st.tuples(st.integers(8, 64), st.integers(8, 64))


@settings(max_examples=30, deadline=None)
@given(dims, st.integers(0, 2**32 - 1))
def test_raw_and_png_roundtrip_lossless(shape, seed):
    h, w = shape
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    img = rng.integers(0, 256, (h, w)).astype(np.uint8)
    assert np.array_equal(codecs.decode_raw(codecs.encode_raw(img), h, w), img)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(img)), img)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_dct_psnr_on_smooth_content(seed):
    """Arbitrary images of the datagen smoothness class stay near 40 dB
    through the pinned quality-90 jpeg-class codec (38 dB with tail
    slack for out-of-distribution RNG streams; the ≥40 dB north-rule
    invariant is asserted on the actual corpus below)."""
    from rsgislib_spark.datagen import _image_pixels

    rng = np.random.Generator(np.random.Philox(key=[seed, 1]))
    img = _image_pixels(rng, 64, 64)
    rt = codecs.decode_dct(codecs.encode_dct(img, quality=90))
    assert codecs.psnr(img.astype(np.float64), rt.astype(np.float64)) >= 38.0


def test_corpus_psnr_invariant_40db():
    """BASELINE.json per-row invariant on the real generator corpus:
    every lossy image decodes within ≥ 40 dB of a re-encode round trip."""
    from rsgislib_spark import datagen

    pdf = datagen.gen_images(120, seed=42)
    for rec in pdf[pdf["fmt"] == "jpg"].itertuples(index=False):
        img = codecs.decode_image(bytes(rec.bytes), "jpg", int(rec.h), int(rec.w))
        rt = codecs.decode_image(
            codecs.encode_image(img, "jpg"), "jpg", int(rec.h), int(rec.w)
        )
        assert codecs.psnr(img.astype(np.float64), rt.astype(np.float64)) >= 40.0


@settings(max_examples=20, deadline=None)
@given(dims, st.integers(0, 2**32 - 1))
def test_phash_deterministic_and_robust_to_mild_noise(shape, seed):
    h, w = shape
    rng = np.random.Generator(np.random.Philox(key=[seed, 2]))
    base = np.clip(
        np.cumsum(rng.normal(0, 4, (h, w)), axis=1) + 128, 0, 255
    ).astype(np.uint8)
    h1 = phash64(base)
    assert h1 == phash64(base.copy())
    # one-pixel perturbation flips at most a few bits
    pert = base.copy()
    pert[h // 2, w // 2] = 255 - pert[h // 2, w // 2]
    dist = bin(np.uint64(h1) ^ np.uint64(phash64(pert))).count("1")
    assert dist <= 16


def test_images_equal_tolerance_semantics():
    a = np.zeros((4, 4))
    b = a + 0.00005
    assert codecs.images_equal(a, b, flt_dif=0.0001, prop_eql=1.0)
    b2 = a.copy()
    b2[0, 0] = 5.0
    assert not codecs.images_equal(a, b2, flt_dif=0.0001, prop_eql=1.0)
    assert codecs.images_equal(a, b2, flt_dif=0.0001, prop_eql=0.9)


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_decode_dct_batch_matches_per_image(seed):
    """The batched flat-GEMM decoder (one IDCT GEMM pair per quality
    group) is bit-identical to per-image decode_dct, including MIXED
    qualities and dims in one batch, with outputs aligned to inputs."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 2]))
    dims_q = [(64, 64, 90), (72, 80, 75), (64, 64, 90), (100, 56, 50), (8, 8, 90)]
    imgs = [rng.integers(0, 256, (h, w)).astype(np.uint8) for h, w, _ in dims_q]
    bufs = [codecs.encode_dct(a, quality=q) for a, (_, _, q) in zip(imgs, dims_q)]
    outs = codecs.decode_dct_batch(bufs)
    assert len(outs) == len(bufs)
    for b, o in zip(bufs, outs):
        assert np.array_equal(codecs.decode_dct(b), o)
    assert codecs.decode_dct_batch([]) == []


def test_arrow_binary_views_layouts():
    """Offset width follows the Arrow type: binary=int32,
    large_binary=int64 (spark.sql.execution.arrow.useLargeVarTypes);
    sliced arrays honour arr.offset."""
    import pyarrow as pa

    payload = [b"abc", b"", b"xy" * 100]
    for typ in (pa.binary(), pa.large_binary()):
        arr = pa.array(payload, type=typ)
        assert [bytes(v) for v in codecs.arrow_binary_views(arr)] == payload
        assert [bytes(v) for v in codecs.arrow_binary_views(arr.slice(1))] == payload[1:]


def test_arrow_binary_views_rejects_nulls():
    """A null payload row must fail diagnosably at the Arrow boundary,
    not surface as an empty buffer deep inside a decoder."""
    import pytest
    import pyarrow as pa

    arr = pa.array([b"abc", None, b"xyz"], type=pa.binary())
    with pytest.raises(ValueError, match="null payload"):
        codecs.arrow_binary_views(arr)
    # a slice past the null is all-valid again and must work
    assert [bytes(v) for v in codecs.arrow_binary_views(arr.slice(2))] == [b"xyz"]
