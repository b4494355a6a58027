"""Variable-resolution eval under XLA static shapes.

The reference evaluates at native aspect ratio (short side 600,
visual_utils.py:34-47) with per-sample shapes — free in eager PyTorch,
but every distinct shape is a fresh XLA compile. Strategy here
(SURVEY.md §7 hard part): round each image up to a (multiple-of-`quantum`)
bucket with edge padding, run the jitted rollout per bucket (a handful of
compiles total), and compute metrics over the valid region only.

Edge padding (not zeros) keeps the ResNet global-mean feature and the
operators' spatial stats close to the unpadded image; metrics mask the
padding out exactly.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def bucket_shape(h: int, w: int, quantum: int = 64,
                 max_side: int = 1024) -> Tuple[int, int]:
    def up(x):
        return min(int(np.ceil(x / quantum)) * quantum, max_side)

    return up(h), up(w)


def pad_to_bucket(img_chw: np.ndarray, quantum: int = 64,
                  max_side: int = 1024):
    """(3, h, w) -> (3, H, W) edge-padded + (h, w) valid size.

    Raises on images exceeding max_side — silently cropping them would
    corrupt eval metrics; callers must resize first (see fit_within)."""
    _, h, w = img_chw.shape
    if h > max_side or w > max_side:
        raise ValueError(
            f"image {h}x{w} exceeds max_side={max_side}; resize it first "
            "(evals.bucketing.fit_within) instead of cropping")
    hb, wb = bucket_shape(h, w, quantum, max_side)
    out = np.pad(img_chw, ((0, 0), (0, hb - h), (0, wb - w)), mode="edge")
    return out, (h, w)


def fit_within(img_chw: np.ndarray, max_side: int = 1024) -> np.ndarray:
    """Downscale (3, h, w) so the long side fits max_side (aspect kept,
    bilinear); returns the input unchanged when it already fits."""
    _, h, w = img_chw.shape
    if max(h, w) <= max_side:
        return img_chw
    from t2onet_tpu.native import resize_bilinear

    scale = max_side / max(h, w)
    oh, ow = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
    hwc = np.ascontiguousarray(np.moveaxis(img_chw, 0, -1))
    return np.moveaxis(resize_bilinear(hwc, oh, ow), -1, 0)


def masked_l1(a, b, valid_hw) -> float:
    h, w = valid_hw
    import jax.numpy as jnp

    return float(jnp.abs(a[..., :h, :w] - b[..., :h, :w]).mean())


def crop_valid(img, valid_hw):
    h, w = valid_hw
    return img[..., :h, :w]
