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
    """(3, h, w) -> (3, H, W) edge-padded + (h, w) valid size."""
    _, h, w = img_chw.shape
    hb, wb = bucket_shape(h, w, quantum, max_side)
    h, w = min(h, hb), min(w, wb)
    img_chw = img_chw[:, :h, :w]
    out = np.pad(img_chw, ((0, 0), (0, hb - h), (0, wb - w)), mode="edge")
    return out, (h, w)


def masked_l1(a, b, valid_hw) -> float:
    h, w = valid_hw
    import jax.numpy as jnp

    return float(jnp.abs(a[..., :h, :w] - b[..., :h, :w]).mean())


def crop_valid(img, valid_hw):
    h, w = valid_hw
    return img[..., :h, :w]
