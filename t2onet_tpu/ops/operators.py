"""The eight differentiable editing operators + extras, as pure functions.

Spec: reference models/operators.py (each op cites its `process`). Every
op maps ``(img, param) -> img`` with img (B, 3, H, W) float32 in [0, 1]
and param (B, k) (k per-op). No modules, no state: parameter *heads* live
in :mod:`t2onet_tpu.ops.bank`; these are just the pixel math, so they can
be vmapped over planner candidates and fused by XLA/Pallas.

Masked application + clamping (reference operators.py:129-130) is
factored into :func:`mask_blend`.
"""

from __future__ import annotations

import jax.numpy as jnp

from t2onet_tpu.ops.color import hsv_to_rgb, lerp, rgb2lum, rgb_to_hsv

# Executor registration order (reference: executors/executor.py:21-30).
OP_NAMES = (
    "brightness",
    "contrast",
    "saturation",
    "color",
    "inpaint",
    "tone",
    "sharpness",
    "white",
)
# Parameter counts per op (reference: per-op num_op_param; color = 3*8).
PARAM_COUNTS = (1, 1, 1, 24, 1, 8, 1, 1)

CURVE_STEPS = 8


def _s(param):
    """Scalar per-image param (B,), (B,1) or (B,k) -> (B, 1, 1, 1); uses col 0."""
    param = jnp.asarray(param)
    if param.ndim == 1:
        param = param[:, None]
    return param[:, 0:1, None, None]


def mask_blend(out, img, mask=None):
    """Blend the processed image into the unmasked original and clamp
    (reference: operators.py:129-130)."""
    if mask is not None:
        out = out * mask + img * (1.0 - mask)
    return jnp.clip(out, 0.0, 1.0)


# ---------------------------------------------------------------------------
# the executor's 8 ops
# ---------------------------------------------------------------------------

def brightness(img, param):
    """HSV value scale: v' = clip(v*(1+p)) (reference: operators.py:277-283),
    computed in RGB space: rgb' = rgb * v'/v (exact — scaling V scales every
    channel; verified vs the HSV round-trip to fp32 ulp). No transcendentals,
    so the VPU does 3 multiplies instead of a full HSV round-trip."""
    v = jnp.max(img, axis=1, keepdims=True)
    k = jnp.clip(v * (1.0 + _s(param)), 0.0, 1.0) / (v + 1e-12)
    return img * k


def contrast(img, param):
    """Cosine-luminance contrast curve (reference: operators.py:240-245)."""
    lum = jnp.clip(rgb2lum(img), 0.0, 1.0)
    contrast_lum = -jnp.cos(jnp.pi * lum) * 0.5 + 0.5
    contrast_img = img / (lum + 1e-6) * contrast_lum
    return lerp(img, contrast_img, _s(param))


def saturation(img, param):
    """HSV saturation scale: s' = clip(s*(1+p)) (reference:
    operators.py:473-479), computed in RGB space: every channel is
    c = v*(1 - s*x_c), so scaling s by r gives c' = v - r*(v - c) (exact;
    verified vs the HSV round-trip to fp32 ulp)."""
    v = jnp.max(img, axis=1, keepdims=True)
    mn = jnp.min(img, axis=1, keepdims=True)
    s = (v - mn) / (v + 1e-8)
    ratio = jnp.clip(s * (1.0 + _s(param)), 0.0, 1.0) / (s + 1e-12)
    return v - ratio * (v - img)


def _piecewise_curve(img, curve):
    """Shared piecewise-linear monotone curve used by tone & color
    (reference: operators.py:571-585, 607-616).

    curve: (B, C, S) with C in {1, 3}; applies
    out = (sum_i clip(img - i/S, 0, 1/S) * c_i) * S / sum(c).
    """
    b, c, s = curve.shape
    curve = curve[:, :, :, None, None]                      # (B, C, S, 1, 1)
    curve_sum = curve.sum(2) + 1e-10                        # (B, C, 1, 1)
    steps = jnp.arange(s, dtype=img.dtype) / s              # (S,)
    # (B, 1, S, H, W) segments; broadcast across channels
    seg = jnp.clip(img[:, :, None] - steps[None, None, :, None, None], 0.0, 1.0 / s)
    total = (seg * curve).sum(2)                            # (B, C/3, H, W) -> broadcast
    return total * s / curve_sum


def tone_curve(img, param):
    """8-step tone curve shared across channels (reference: operators.py:571-585)."""
    curve = param.reshape(-1, 1, CURVE_STEPS)
    return _piecewise_curve(img, curve)


def color_curve(img, param):
    """Per-RGB-channel 8-step curve (reference: operators.py:607-616)."""
    curve = param.reshape(-1, 3, CURVE_STEPS)
    return _piecewise_curve(img, curve)


import numpy as _np

# Host-side (numpy) so taps stay Python floats under jit tracing.
_LAPLACIAN = _np.array(
    [[0.0, -1.0, 0.0], [-1.0, 4.0, -1.0], [0.0, -1.0, 0.0]], dtype=_np.float32
)


def _conv3x3_same(img, kernel):
    """Depthwise 3x3 'same' (zero-padded) conv via shifted adds.

    Shift-and-add lowers to pure VPU adds (no im2col / MXU traffic), which
    is faster than a conv for a 4-tap kernel and Pallas-portable.
    kernel: host-side numpy (3, 3) — taps are baked in as scalars.
    """
    out = jnp.zeros_like(img)
    for dy in range(3):
        for dx in range(3):
            w = float(kernel[dy, dx])
            if w == 0.0:
                continue
            shifted = jnp.roll(img, shift=(1 - dy, 1 - dx), axis=(2, 3))
            # zero out wrapped rows/cols to emulate zero padding
            if dy == 0:
                shifted = shifted.at[:, :, 0, :].set(0.0)
            elif dy == 2:
                shifted = shifted.at[:, :, -1, :].set(0.0)
            if dx == 0:
                shifted = shifted.at[:, :, :, 0].set(0.0)
            elif dx == 2:
                shifted = shifted.at[:, :, :, -1].set(0.0)
            out = out + w * shifted
    return out


def sharpness(img, param):
    """img + p * Laplacian(img) (reference: operators.py:351-358)."""
    delta = _conv3x3_same(img, _LAPLACIAN)
    return img + _s(param) * delta


def white(img, param):
    """All-ones fill — white inside the mask (reference: operators.py:510-512)."""
    del param
    return jnp.ones_like(img)


def inpaint(img, param, inpaint_fn=None):
    """Inpainting slot. The reference calls an external EdgeConnect net
    (reference: operators.py:680-682) through a non-vendored submodule; here
    the backend is pluggable and defaults to identity (the FiveK planner
    excludes inpaint entirely, reference gen_greedy_seqs_FiveK.py:39)."""
    del param
    if inpaint_fn is not None:
        return inpaint_fn(img)
    return img


# ---------------------------------------------------------------------------
# extra ops kept for API parity (reverse machinery, interactive tests)
# ---------------------------------------------------------------------------

def exposure(img, param):
    """img * 2^p (reference: operators.py:209-210)."""
    return img * jnp.exp(_s(param) * jnp.log(2.0))


def bnw(img, param):
    """Desaturate toward luminance (reference: operators.py:315-317)."""
    return lerp(img, rgb2lum(img), _s(param))


_GAUSS3 = None


def _gauss3x3_sigma2():
    """3x3 gaussian (sigma=2), normalized (reference: operators.py:685-717)."""
    global _GAUSS3
    if _GAUSS3 is None:
        coords = _np.arange(3, dtype=_np.float32)
        g = _np.exp(-((coords - 1.0) ** 2) / (2.0 * 4.0))
        k = _np.outer(g, g)
        _GAUSS3 = k / k.sum()
    return _GAUSS3


def blur(img, param):
    """lerp(img, gauss3x3_sigma2(img), p) (reference: operators.py:392-398)."""
    blurred = _conv3x3_same(img, _gauss3x3_sigma2())
    return lerp(img, blurred, _s(param))


def hue(img, param):
    """Replace hue with p (reference: operators.py:431-439). h in [0,1)."""
    _, s, v = rgb_to_hsv(img)
    h_new = jnp.broadcast_to(_s(param), s.shape)
    return hsv_to_rgb(h_new, s, v)


def white_balance(img, param):
    """Per-channel gains (reference: operators.py:548-549); param (B, 3)."""
    return img * param[:, :, None, None]


# Name -> fn for the reverse machinery & tests.
OP_FNS = {
    "brightness": brightness,
    "contrast": contrast,
    "saturation": saturation,
    "color": color_curve,
    "inpaint": inpaint,
    "tone": tone_curve,
    "sharpness": sharpness,
    "white": white,
    "exposure": exposure,
    "bnw": bnw,
    "blur": blur,
    "hue": hue,
    "whitebalance": white_balance,
}


def apply_op_by_index(img, op_index: int, param, mask=None,
                      inpaint_fn=None):
    """Apply executor-op `op_index` (static int) with masking + clamp.

    Negative index is the identity pass-through for special tokens
    (reference: executors/executor.py:44-46). ``inpaint_fn`` backs the
    inpaint slot (reference: an external EdgeConnect model,
    models/operators.py:625-682); without it the slot is identity.
    """
    if op_index < 0:
        return img
    name = OP_NAMES[op_index]
    if name == "inpaint":
        return mask_blend(inpaint(img, param, inpaint_fn), img, mask)
    return mask_blend(OP_FNS[name](img, param), img, mask)
