"""Branchless color-space math for TPU.

The reference leans on kornia's CUDA RGB<->HSV (reference:
models/operators.py:278-282, 432-438, 474-478) and small tensor helpers
(reference: utils/operator_utils.py:5-34). Everything here is pure jnp,
fully vectorized (no data-dependent control flow) so it vmaps, jits, and
lowers into a single fused elementwise XLA/Pallas region.

Hue convention: h in [0, 1) (fraction of the color wheel). The reference's
kornia returns radians, but every operator that round-trips through HSV
(brightness, saturation) leaves hue untouched, so results are identical
under any internally-consistent convention.

Images are NCHW (B, 3, H, W) float32 in [0, 1].
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_EPS = 1e-8


def lerp(a, b, t):
    """Linear interpolation (reference: utils/operator_utils.py:5-6)."""
    return (1.0 - t) * a + t * b


def rgb2lum(img):
    """Luminance with the reference's 0.27/0.67/0.06 weights
    (reference: utils/operator_utils.py:9-11). (B,3,H,W) -> (B,1,H,W)."""
    lum = 0.27 * img[:, 0] + 0.67 * img[:, 1] + 0.06 * img[:, 2]
    return lum[:, None]


def tanh01(x):
    """tanh squashed to [0, 1] (reference: utils/operator_utils.py:17-18)."""
    return jnp.tanh(x) * 0.5 + 0.5


def tanh_range(l: float, r: float, initial: float | None = None):
    """Squash to [l, r] with an optional resting point at ``initial``
    (reference: utils/operator_utils.py:21-34)."""
    if initial is not None:
        bias = math.atanh(2.0 * (initial - l) / (r - l) - 1.0)
    else:
        bias = 0.0

    def activation(x):
        return tanh01(x + bias) * (r - l) + l

    return activation


def rgb_to_hsv(img):
    """RGB -> HSV, branchless. img: (B, 3, H, W) in [0,1].

    Returns (h, s, v) each (B, 1, H, W); h in [0, 1).
    """
    r, g, b = img[:, 0:1], img[:, 1:2], img[:, 2:3]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    delta = maxc - minc
    v = maxc
    s = delta / (maxc + _EPS)

    safe_delta = jnp.where(delta > 0, delta, 1.0)
    # sextant offsets: r-max -> (g-b)/d mod 6; g-max -> (b-r)/d + 2; b-max -> (r-g)/d + 4
    h_r = jnp.mod((g - b) / safe_delta, 6.0)
    h_g = (b - r) / safe_delta + 2.0
    h_b = (r - g) / safe_delta + 4.0
    h = jnp.where(maxc == r, h_r, jnp.where(maxc == g, h_g, h_b))
    h = jnp.where(delta > 0, h / 6.0, 0.0)
    return h, s, v


def hsv_to_rgb(h, s, v):
    """HSV -> RGB, branchless. h in [0, 1) (values outside wrap), s, v in [0,1].

    Args are (B, 1, H, W); returns (B, 3, H, W).
    """
    h6 = jnp.mod(h, 1.0) * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))

    # sextant selection without gather: sum of indicator * candidate
    i0 = (i == 0)
    i1 = (i == 1)
    i2 = (i == 2)
    i3 = (i == 3)
    i4 = (i == 4)
    i5 = (i == 5)
    r = jnp.where(i0 | i5, v, jnp.where(i1, q, jnp.where(i4, t, p)))
    g = jnp.where(i0, t, jnp.where(i1 | i2, v, jnp.where(i3, q, p)))
    b = jnp.where(i2, t, jnp.where(i3 | i4, v, jnp.where(i5, q, p)))
    return jnp.concatenate([r, g, b], axis=1)
