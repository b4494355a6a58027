"""Image quality metrics: L1, SSIM, FID — the reference's eval protocol.

Spec: reference utils/eval.py (ImageEvaluator), utils/ssim/__init__.py
(gaussian window 11, sigma 1.5), utils/FID/fid_score.py:159-230
(Frechet distance with sqrtm stabilization).

SSIM runs on-device (jnp depthwise convs); FID statistics are tiny and run
in numpy/scipy on the host. The FID *feature extractor* is pluggable
(`features_fn(imgs (N,3,H,W) in [0,1]) -> (N, D)`): the reference uses a
pretrained InceptionV3 pool3, whose weights must be provided by the user
(torchvision download) — this environment has no egress, so the default
evaluator skips FID unless an extractor is injected.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# 10 canonical requests for the output-variance probe (reference eval.py:11)
TEST_TXTS = [
    "increase the brightness", "decrease the brightness", "enhance the color",
    "decrease the color", "improve contrast", "reduce contrast",
    "increase saturation", "reduce saturation",
    "increase the brightness a little", "increase the brightness a lot",
]


def l1_distance(a, b) -> jnp.ndarray:
    """Mean absolute distance (reference eval.py:50-54)."""
    return jnp.abs(a - b).mean()


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.array([math.exp(-((x - window_size // 2) ** 2)
                           / (2.0 * sigma ** 2)) for x in range(window_size)],
                 np.float32)
    g /= g.sum()
    return np.outer(g, g)


def _depthwise_same(img, window):
    """(B,C,H,W) depthwise 'same' conv with a (k,k) window."""
    c = img.shape[1]
    k = window.shape[0]
    w = jnp.asarray(window)[None, None].repeat(c, axis=0)  # (C,1,k,k)
    return jax.lax.conv_general_dilated(
        img, w, window_strides=(1, 1), padding=[(k // 2, k // 2)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c)


def ssim(img1, img2, window_size: int = 11, size_average: bool = True):
    """SSIM with gaussian window (reference utils/ssim/__init__.py:20-66).

    Matches the reference's zero-padded 'same' conv convention (edges are
    included with implicit zero padding).
    """
    window = _gaussian_window(window_size)
    mu1 = _depthwise_same(img1, window)
    mu2 = _depthwise_same(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_same(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_same(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_same(img1 * img2, window) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))


def ssim_np(img1: np.ndarray, img2: np.ndarray, window_size: int = 11
            ) -> float:
    """Host-side SSIM (scipy fftconvolve, zero-padded 'same') — identical
    formula to :func:`ssim`; used for native-resolution eval where every
    sample has a distinct shape (device SSIM would recompile per shape)."""
    from scipy.signal import fftconvolve

    w = _gaussian_window(window_size).astype(np.float64)

    def conv(x):
        return np.stack([
            np.stack([fftconvolve(x[b, c], w, mode="same")
                      for c in range(x.shape[1])])
            for b in range(x.shape[0])])

    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    mu1, mu2 = conv(img1), conv(img2)
    s1 = conv(img1 * img1) - mu1 ** 2
    s2 = conv(img2 * img2) - mu2 ** 2
    s12 = conv(img1 * img2) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
    return float(m.mean())


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6
                               ) -> float:
    """Frechet distance between gaussians (reference fid_score.py:159-230),
    including the eps-offset retry and imaginary-component check."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    import warnings

    # disp= is deprecated (scipy 1.18 removes it). Keep its old contract:
    # a singular product must reach the eps-offset retry silently — not
    # warn (or raise under -W error) before isfinite() can see the NaNs.
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", linalg.LinAlgWarning)
            covmean = linalg.sqrtm(sigma1.dot(sigma2))
    except linalg.LinAlgError:
        covmean = np.full_like(sigma1, np.nan)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return (diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
            - 2 * np.trace(covmean))


class ImageEvaluator:
    """Running L1/SSIM + corpus FID (reference eval.py:13-90).

    :param features_fn: optional (N,3,H,W)->(N,D) feature extractor for FID.
    """

    def __init__(self, features_fn: Optional[Callable] = None,
                 window_size: int = 11, host_metrics: bool = False):
        self.features_fn = features_fn
        self.window_size = window_size
        self.host_metrics = host_metrics    # native-res eval: no per-shape jit
        self.reset()

    def reset(self):
        self.itr = 0
        self.avg_out_L1 = 0.0
        self.avg_in_L1 = 0.0
        self.avg_out_SSIM = 0.0
        self.avg_in_SSIM = 0.0
        self.arrs_in: List[np.ndarray] = []
        self.arrs_out: List[np.ndarray] = []
        self.arrs_gt: List[np.ndarray] = []

    def update(self, inp, out, gt):
        """All args (1,3,H,W) in [0,1] (jnp or numpy)."""
        self.itr += 1
        r = 1.0 / self.itr
        if self.host_metrics:
            inp, out, gt = map(np.asarray, (inp, out, gt))
            in_l1 = float(np.abs(inp - gt).mean())
            out_l1 = float(np.abs(out - gt).mean())
            in_ss = ssim_np(inp, gt, self.window_size)
            out_ss = ssim_np(out, gt, self.window_size)
        else:
            inp, out, gt = map(jnp.asarray, (inp, out, gt))
            in_l1 = float(l1_distance(inp, gt))
            out_l1 = float(l1_distance(out, gt))
            in_ss = float(ssim(inp, gt, self.window_size))
            out_ss = float(ssim(out, gt, self.window_size))
        self.avg_in_L1 += (in_l1 - self.avg_in_L1) * r
        self.avg_out_L1 += (out_l1 - self.avg_out_L1) * r
        self.avg_in_SSIM += (in_ss - self.avg_in_SSIM) * r
        self.avg_out_SSIM += (out_ss - self.avg_out_SSIM) * r
        if self.features_fn is not None:
            self.arrs_in.append(np.asarray(self.features_fn(inp)))
            self.arrs_out.append(np.asarray(self.features_fn(out)))
            self.arrs_gt.append(np.asarray(self.features_fn(gt)))

    def calc_fid(self):
        if not self.arrs_gt:
            return None, None
        a_in = np.concatenate(self.arrs_in, 0)
        a_out = np.concatenate(self.arrs_out, 0)
        a_gt = np.concatenate(self.arrs_gt, 0)
        stats = [(a.mean(0), np.cov(a, rowvar=False))
                 for a in (a_in, a_out, a_gt)]
        fid_in = calculate_frechet_distance(*stats[0], *stats[2])
        fid_out = calculate_frechet_distance(*stats[1], *stats[2])
        return fid_in, fid_out

    def eval(self) -> dict:
        res = {
            "in_L1": self.avg_in_L1, "out_L1": self.avg_out_L1,
            "in_SSIM": self.avg_in_SSIM, "out_SSIM": self.avg_out_SSIM,
        }
        print(f"input L1 dist {res['in_L1']:.4f}, "
              f"output L1 dist {res['out_L1']:.4f}")
        print(f"input SSIM {res['in_SSIM']:.4f}, "
              f"output SSIM {res['out_SSIM']:.4f}")
        fid_in, fid_out = self.calc_fid()
        if fid_in is not None:
            res["in_FID"], res["out_FID"] = fid_in, fid_out
            print(f"input FID {fid_in:.4f}, output FID {fid_out:.4f}")
        return res
