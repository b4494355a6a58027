"""Golden numerical tests for the operator library.

Oracles are independent numpy/colorsys implementations of the reference
formulas (reference: models/operators.py — cited per test). Tolerance 1e-5
(same math, different op order).
"""

import colorsys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2onet_tpu.ops import color as C
from t2onet_tpu.ops import operators as O
from t2onet_tpu.ops import bank


# ---------------------------------------------------------------------------
# color space
# ---------------------------------------------------------------------------

def _colorsys_hsv(img):
    """Per-pixel oracle via stdlib colorsys. img (B,3,H,W) -> h,s,v arrays."""
    b, _, h_, w_ = img.shape
    out = np.zeros((b, 3, h_, w_), np.float64)
    for bi in range(b):
        for y in range(h_):
            for x in range(w_):
                r, g, bl = img[bi, :, y, x]
                out[bi, :, y, x] = colorsys.rgb_to_hsv(r, g, bl)
    return out[:, 0:1], out[:, 1:2], out[:, 2:3]


def test_rgb_to_hsv_matches_colorsys(img_batch):
    h, s, v = C.rgb_to_hsv(jnp.asarray(img_batch))
    h0, s0, v0 = _colorsys_hsv(img_batch)
    np.testing.assert_allclose(np.asarray(h), h0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s), s0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), v0, atol=1e-5)


def test_hsv_round_trip(img_batch):
    h, s, v = C.rgb_to_hsv(jnp.asarray(img_batch))
    back = C.hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), img_batch, atol=1e-5)


def test_hsv_gray_pixels_stable():
    """s=0 / v=0 singular points must not produce NaN (SURVEY §7 hard part)."""
    img = jnp.broadcast_to(
        jnp.array([0.0, 0.5, 1.0])[None, :, None, None] * jnp.ones((1, 3, 2, 2)),
        (1, 3, 2, 2),
    ) * 0.0 + jnp.stack([jnp.full((2, 2), c) for c in (0.5, 0.5, 0.5)])[None]
    h, s, v = C.rgb_to_hsv(img)
    back = C.hsv_to_rgb(h, s, v)
    assert np.isfinite(np.asarray(back)).all()
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-6)


def test_hsv_gradients_finite(img_batch):
    def f(x):
        h, s, v = C.rgb_to_hsv(x)
        return jnp.sum(C.hsv_to_rgb(h, s * 0.9, jnp.clip(v * 1.1, 0, 1)))

    g = jax.grad(f)(jnp.asarray(img_batch))
    assert np.isfinite(np.asarray(g)).all()


def test_tanh_range():
    f = C.tanh_range(-3.5, 3.5, initial=0.0)
    np.testing.assert_allclose(float(f(jnp.array(0.0))), 0.0, atol=1e-6)
    assert float(f(jnp.array(100.0))) <= 3.5
    assert float(f(jnp.array(-100.0))) >= -3.5
    g = C.tanh_range(0.5, 2.0, initial=1.25)
    np.testing.assert_allclose(float(g(jnp.array(0.0))), 1.25, atol=1e-6)


# ---------------------------------------------------------------------------
# per-op golden math (reference: models/operators.py)
# ---------------------------------------------------------------------------

def _lum(img):
    return (0.27 * img[:, 0] + 0.67 * img[:, 1] + 0.06 * img[:, 2])[:, None]


def test_exposure(img_batch):
    """img * 2^p (operators.py:209-210)."""
    p = np.array([[1.5], [-2.0], [0.0], [3.0]], np.float32)
    out = O.exposure(jnp.asarray(img_batch), jnp.asarray(p))
    expect = img_batch * (2.0 ** p)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_contrast(img_batch):
    """lerp(img, img/lum * (-cos(pi*lum)/2+0.5), p) (operators.py:240-245)."""
    p = np.array([[0.3], [-0.7], [1.0], [0.0]], np.float32)
    out = O.contrast(jnp.asarray(img_batch), jnp.asarray(p))
    lum = np.clip(_lum(img_batch), 0, 1)
    clum = -np.cos(np.pi * lum) * 0.5 + 0.5
    cimg = img_batch / (lum + 1e-6) * clum
    expect = (1 - p[:, :, None, None]) * img_batch + p[:, :, None, None] * cimg
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


def test_brightness_value_scale(img_batch):
    """v' = clip(v*(1+p)); hue/sat preserved (operators.py:277-283)."""
    p = np.array([[0.5], [-0.3], [0.0], [2.0]], np.float32)
    out = np.asarray(O.brightness(jnp.asarray(img_batch), jnp.asarray(p)))
    h0, s0, v0 = _colorsys_hsv(img_batch)
    h1, s1, v1 = _colorsys_hsv(out)
    np.testing.assert_allclose(v1, np.clip(v0 * (1 + p[:, :, None, None]), 0, 1),
                               atol=1e-4)
    # hue & saturation preserved where not degenerate
    nz = (s0 > 1e-3) & (v0 > 1e-3) & (v1 > 1e-3) & (s1 > 1e-3)
    np.testing.assert_allclose(h1[nz], h0[nz], atol=1e-3)


def test_saturation_scale(img_batch):
    p = np.array([[0.8], [-0.2], [0.0], [0.4]], np.float32)
    out = np.asarray(O.saturation(jnp.asarray(img_batch), jnp.asarray(p)))
    h0, s0, v0 = _colorsys_hsv(img_batch)
    h1, s1, v1 = _colorsys_hsv(out)
    np.testing.assert_allclose(s1, np.clip(s0 * (1 + p[:, :, None, None]), 0, 1),
                               atol=1e-4)
    np.testing.assert_allclose(v1, v0, atol=1e-4)


def test_bnw(img_batch):
    p = np.array([[0.9], [0.1], [0.5], [1.0]], np.float32)
    out = O.bnw(jnp.asarray(img_batch), jnp.asarray(p))
    lum = _lum(img_batch)
    expect = (1 - p[:, :, None, None]) * img_batch + p[:, :, None, None] * lum
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_sharpness_laplacian(img_batch):
    """img + p * conv(img, [[0,-1,0],[-1,4,-1],[0,-1,0]]) zero-padded
    (operators.py:338, 351-358)."""
    p = np.array([[0.7], [1.5], [0.0], [0.3]], np.float32)
    out = O.sharpness(jnp.asarray(img_batch), jnp.asarray(p))
    k = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], np.float32)
    pad = np.pad(img_batch, ((0, 0), (0, 0), (1, 1), (1, 1)))
    delta = np.zeros_like(img_batch)
    for dy in range(3):
        for dx in range(3):
            delta += k[dy, dx] * pad[:, :, dy:dy + img_batch.shape[2],
                                     dx:dx + img_batch.shape[3]]
    expect = img_batch + p[:, :, None, None] * delta
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_tone_curve(img_batch):
    """Sum_i clip(img - i/8, 0, 1/8)*c_i * 8/sum(c) (operators.py:571-585)."""
    rng = np.random.default_rng(1)
    p = rng.uniform(0.5, 2.0, size=(4, 8)).astype(np.float32)
    out = O.tone_curve(jnp.asarray(img_batch), jnp.asarray(p))
    total = np.zeros_like(img_batch)
    for i in range(8):
        total += np.clip(img_batch - i / 8.0, 0, 1 / 8.0) * p[:, None, i, None, None]
    expect = total * 8.0 / (p.sum(1)[:, None, None, None] + 1e-10)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


def test_color_curve(img_batch):
    rng = np.random.default_rng(2)
    p = rng.uniform(0.9, 1.1, size=(4, 24)).astype(np.float32)
    out = O.color_curve(jnp.asarray(img_batch), jnp.asarray(p))
    curve = p.reshape(4, 3, 8)
    total = np.zeros_like(img_batch)
    for i in range(8):
        total += (np.clip(img_batch - i / 8.0, 0, 1 / 8.0)
                  * curve[:, :, i, None, None])
    expect = total * 8.0 / (curve.sum(2)[:, :, None, None] + 1e-10)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


def test_white_and_inpaint(img_batch):
    x = jnp.asarray(img_batch)
    assert np.all(np.asarray(O.white(x, None)) == 1.0)
    np.testing.assert_array_equal(np.asarray(O.inpaint(x, None)), img_batch)


def test_blur_is_lerp_to_gaussian(img_batch):
    p = np.array([[1.0], [0.0], [0.5], [0.25]], np.float32)
    out = np.asarray(O.blur(jnp.asarray(img_batch), jnp.asarray(p)))
    # p = 0 -> identity
    np.testing.assert_allclose(out[1], img_batch[1], atol=1e-6)
    # kernel normalized: blur of a constant image is the same constant (interior)
    const = np.full((1, 3, 8, 8), 0.25, np.float32)
    outc = np.asarray(O.blur(jnp.asarray(const), jnp.asarray([[1.0]])))
    np.testing.assert_allclose(outc[:, :, 2:-2, 2:-2], 0.25, atol=1e-6)


def test_white_balance(img_batch):
    p = np.array([[1.0, 0.9, 1.2]] * 4, np.float32)
    out = O.white_balance(jnp.asarray(img_batch), jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(out),
                               img_batch * p[:, :, None, None], atol=1e-6)


def test_mask_blend(img_batch):
    mask = np.zeros((4, 1, 16, 16), np.float32)
    mask[:, :, :8] = 1.0
    out = np.asarray(O.mask_blend(jnp.zeros_like(jnp.asarray(img_batch)),
                                  jnp.asarray(img_batch), jnp.asarray(mask)))
    np.testing.assert_allclose(out[:, :, :8], 0.0)
    np.testing.assert_allclose(out[:, :, 8:], img_batch[:, :, 8:])


# ---------------------------------------------------------------------------
# bank: dispatch + heads
# ---------------------------------------------------------------------------

@pytest.fixture
def opcfg():
    from t2onet_tpu.config import OperatorConfig
    return OperatorConfig()


def test_execute_bank_matches_single_ops(img_batch, opcfg):
    """One-hot dispatch must equal calling each op directly."""
    rng = np.random.default_rng(3)
    params = rng.uniform(-0.5, 0.5, size=(4, bank.N_OPS, 24)).astype(np.float32)
    params[:, 5, :8] = rng.uniform(0.5, 2.0, size=(4, 8))   # tone positive
    params[:, 3, :] = rng.uniform(0.9, 1.1, size=(4, 24))   # color positive
    img = jnp.asarray(img_batch)
    for op_idx, name in enumerate(O.OP_NAMES):
        ids = jnp.full((4,), op_idx + bank.VOCAB_OFFSET, jnp.int32)
        out, chosen = bank.execute_bank(img, ids, jnp.asarray(params))
        k = O.PARAM_COUNTS[op_idx]
        direct = O.apply_op_by_index(img, op_idx, jnp.asarray(params[:, op_idx, :k]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                                   atol=1e-5, err_msg=name)
        np.testing.assert_allclose(np.asarray(chosen), params[:, op_idx], atol=1e-6)


def test_execute_bank_special_tokens_identity(img_batch):
    img = jnp.asarray(img_batch)
    params = jnp.zeros((4, bank.N_OPS, 24))
    for tok in (0, 1, 2):
        out, chosen = bank.execute_bank(img, jnp.full((4,), tok, jnp.int32), params)
        np.testing.assert_array_equal(np.asarray(out), img_batch)
        np.testing.assert_array_equal(np.asarray(chosen), 0.0)


def test_execute_bank_mixed_batch(img_batch):
    """Different op per sample in one call (replaces divide_op_group,
    reference actor.py:100-114)."""
    img = jnp.asarray(img_batch)
    rng = np.random.default_rng(4)
    params = jnp.asarray(rng.uniform(0.1, 0.4, size=(4, bank.N_OPS, 24)).astype(np.float32))
    ids = jnp.asarray([3, 4, 2, 9])   # brightness, contrast, END, sharpness
    out, _ = bank.execute_bank(img, ids, params)
    b0 = O.apply_op_by_index(img[0:1], 0, params[0:1, 0, :1])
    c1 = O.apply_op_by_index(img[1:2], 1, params[1:2, 1, :1])
    s3 = O.apply_op_by_index(img[3:4], 6, params[3:4, 6, :1])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(b0[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(c1[0]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out[2]), img_batch[2])
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(s3[0]), atol=1e-5)


def test_squash_params_ranges(opcfg):
    rng = np.random.default_rng(5)
    raw = jnp.asarray(rng.normal(0, 10, size=(16, bank.N_OPS, 24)).astype(np.float32))
    sq = np.asarray(bank.squash_params(raw, opcfg))
    assert (np.abs(sq[:, 0, 0]) <= opcfg.brightness_range + 1e-5).all()
    assert (np.abs(sq[:, 1, 0]) <= 1.0).all()
    assert (sq[:, 2, 0] >= opcfg.saturation_range[0] - 1e-5).all()
    assert (sq[:, 2, 0] <= opcfg.saturation_range[1] + 1e-5).all()
    assert (sq[:, 4] == 0).all()                       # inpaint pseudo
    assert (sq[:, 5, 8:] == 0).all()                   # tone only 8
    assert (sq[:, 6, 0] >= 0).all() and (sq[:, 6, 0] <= opcfg.sharpness_range).all()
    assert (sq[:, 7, 0] >= 0).all() and (sq[:, 7, 0] <= 1).all()
    # scalar ops: only col 0 populated
    for i in (0, 1, 2, 6, 7):
        assert (sq[:, i, 1:] == 0).all()


def test_head_shapes_and_grad(opcfg):
    key = jax.random.PRNGKey(0)
    heads = bank.init_head_params(key)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (4, 512))

    def loss(h):
        return jnp.sum(bank.predict_params(h, ctx, opcfg) ** 2)

    g = jax.grad(loss)(heads)
    assert g.w1.shape == (bank.N_OPS, 512, 512)
    assert np.isfinite(np.asarray(g.w1)).all()
    p = bank.predict_params(heads, ctx, opcfg)
    assert p.shape == (4, bank.N_OPS, 24)


# ---------------------------------------------------------------------------
# reverse-op machinery (reference operators.py:920-1010)
# ---------------------------------------------------------------------------

def test_reverse_brightness():
    from t2onet_tpu.ops.reverse import apply_operator, get_reverse

    rng = np.random.default_rng(7)
    img = jnp.asarray(np.clip(rng.uniform(0.2, 0.8, (1, 3, 16, 16)),
                              0, 1).astype(np.float32))
    out = apply_operator(img, None, [0.3], "brightness")
    rev_param, rev_name = get_reverse(img, out, None, [0.3], "brightness")
    assert rev_name == "brightness"
    back = apply_operator(out, None, rev_param, rev_name)
    assert float(jnp.abs(back - img).mean()) < 0.02


def test_reverse_sharpness_blur_pair():
    from t2onet_tpu.ops.reverse import rev_ops_dict, get_rev_param0

    assert rev_ops_dict["sharpness"] == "blur"
    assert rev_ops_dict["blur"] == "sharpness"
    assert get_rev_param0([0.4], "contrast") == [-0.4]
    assert get_rev_param0([0.4], "blur") == [0.4]


def test_reverse_strong_edit_escapes_clamp_plateau():
    """Reversing a strong brightness push (p=1.5) puts the naive init
    (-1.5) past brightness's internal clip knee where the gradient is
    exactly zero; the strategic (scaled/zero) starts must still recover
    the interior optimum instead of tripping the failure assert."""
    import jax.numpy as jnp

    from t2onet_tpu.ops import operators as O
    from t2onet_tpu.ops.reverse import apply_operator, get_reverse

    rng = np.random.default_rng(0)
    img = rng.uniform(0.05, 0.4, (1, 3, 24, 24)).astype(np.float32)
    out = np.asarray(O.mask_blend(
        O.brightness(jnp.asarray(img), jnp.array([[1.5]])),
        jnp.asarray(img)))
    rev_param, rev_name = get_reverse(img, out, None, [1.5], "brightness")
    assert rev_name == "brightness"
    rec = np.asarray(apply_operator(out, None, rev_param, rev_name))
    assert np.abs(rec - img).mean() < 0.01
