"""Native library tests (vs cv2 / numpy oracles). Skipped when unbuilt —
build with `sh native/build.sh`."""

import numpy as np
import pytest

from t2onet_tpu import native
from t2onet_tpu.data.rle import rle_encode

needs_native = pytest.mark.skipif(not native.is_available(),
                                  reason="native lib not built")


@needs_native
def test_native_rle_roundtrip(rng):
    mask = (rng.uniform(size=(37, 23)) > 0.5).astype(np.uint8)
    np.testing.assert_array_equal(native.rle_decode(rle_encode(mask)), mask)


@needs_native
def test_native_rle_string(rng):
    from tests.test_data import _counts_to_string

    mask = (rng.uniform(size=(19, 7)) > 0.4).astype(np.uint8)
    rle = rle_encode(mask)
    s = _counts_to_string(rle["counts"])
    np.testing.assert_array_equal(
        native.rle_decode({"size": rle["size"], "counts": s}), mask)


@needs_native
def test_native_resize_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.uniform(0, 1, (41, 67, 3)).astype(np.float32)
    mine = native.resize_bilinear(img, 16, 24)
    ref = cv2.resize(img, (24, 16), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(mine, ref, atol=1e-6)
    mask = (rng.uniform(size=(41, 67)) > 0.5).astype(np.uint8)
    np.testing.assert_array_equal(
        native.resize_nearest(mask, 10, 8),
        cv2.resize(mask, (8, 10), interpolation=cv2.INTER_NEAREST))


@needs_native
def test_native_bgr_transform(rng):
    bgr = rng.integers(0, 255, (12, 13, 3)).astype(np.uint8)
    expect = bgr[:, :, ::-1].astype(np.float32).transpose(2, 0, 1) / 255.0
    np.testing.assert_allclose(native.bgr_u8_to_rgb_chw(bgr), expect,
                               atol=1e-7)


@needs_native
def test_native_batch_resize(rng):
    batch = rng.uniform(0, 1, (5, 32, 32, 3)).astype(np.float32)
    out = native.batch_resize_bilinear(batch, 16, 16, n_threads=2)
    single = np.stack([native.resize_bilinear(im, 16, 16) for im in batch])
    np.testing.assert_allclose(out, single, atol=1e-7)


def test_native_nearest_exact_boundary_pairs(rng):
    """cv2 derives the nearest-resize scale as 1/(dst/src); computing
    src/dst instead flips floor() at exact-integer products, silently
    making masks build-dependent. Pin the pairs that exposed it."""
    cv2 = pytest.importorskip("cv2")
    for (h, w, oh, ow) in [(14, 14, 18, 18), (21, 21, 27, 27),
                           (22, 22, 18, 18), (26, 26, 10, 10),
                           (26, 26, 20, 20), (600, 400, 450, 300)]:
        mask = (rng.uniform(size=(h, w)) > 0.5).astype(np.uint8)
        np.testing.assert_array_equal(
            native.resize_nearest(mask, oh, ow),
            cv2.resize(mask, (ow, oh), interpolation=cv2.INTER_NEAREST))
