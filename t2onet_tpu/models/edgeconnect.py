"""EdgeConnect generators (Nazeri et al. 2019) in flax + checkpoint
converter — pretrained-weights interop for the inpaint operator slot.

The reference's InpaintOperator delegates to an EdgeConnect git
submodule it does not vendor (reference models/operators.py:625-682:
MODE=2, MODEL=3 — EdgeModel predicts edges in the hole, then
InpaintingModel fills RGB conditioned on those edges;
pyutils/edgeconnect checkpoints). This module provides the same
capability TPU-side:

- `EdgeGenerator` / `InpaintGenerator`: the public EdgeConnect
  architectures (7x7 stem, two stride-2 conv downsamples, 8
  dilation-2 residual blocks, two transposed-conv upsamples), NHWC.
- `convert_edgeconnect_gen`: `EdgeModel_gen.pth` / `InpaintingModel_gen
  .pth` state_dict -> flax variables, resolving spectral-norm
  reparameterization (weight = weight_orig / (u^T W v)) at load time —
  inference needs only the normalized weight.
- `make_edgeconnect_inpaint_fn`: the full MODEL=3 test pipeline as an
  `inpaint_fn(img)` closure for the operator bank's inpaint slot
  (ops/bank.py), with host-side canny edges (scipy.ndimage).

InstanceNorm (torch affine=False, track_running_stats=False) maps to
per-sample GroupNorm with one group per channel and no scale/bias.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _inorm(x, eps: float = 1e-5):
    """InstanceNorm2d(affine=False): normalize each (sample, channel)
    plane over its spatial extent."""
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps)


def _rpad(x, p: int):
    """ReflectionPad2d(p) on NHWC (EdgeConnect pads 7x7 stems and
    residual-block convs with reflection, not zeros)."""
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class _ResBlock(nn.Module):
    """EdgeConnect residual block: dilated 3x3 (dilation 2, pad 2) ->
    IN -> ReLU -> 3x3 (pad 1) -> IN, additive skip."""
    dim: int = 256

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (3, 3), padding=0, kernel_dilation=(2, 2),
                    name="conv1")(_rpad(x, 2))
        y = nn.relu(_inorm(y))
        y = nn.Conv(self.dim, (3, 3), padding=0, name="conv2")(_rpad(y, 1))
        y = _inorm(y)
        return x + y


class _TorchConvT(nn.Module):
    """torch ConvTranspose2d(k=4, s=2, p=1) in flax: lax.conv_transpose
    with transpose_kernel=True matches torch's gradient-of-conv
    semantics; torch's output padding p maps to lax padding
    (k - 1 - p) on each side."""
    out: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (4, 4, self.out, x.shape[-1]))       # HWOI (transpose layout)
        bias = self.param("bias", nn.initializers.zeros, (self.out,))
        y = jax.lax.conv_transpose(
            x, kernel, strides=(2, 2), padding=[(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True)
        return y + bias


class _Backbone(nn.Module):
    """Shared EdgeConnect generator trunk; in/out channels differ."""
    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), padding=0, name="enc1")(_rpad(x, 3))
        x = nn.relu(_inorm(x))
        x = nn.Conv(128, (4, 4), (2, 2), padding=1, name="enc2")(x)
        x = nn.relu(_inorm(x))
        x = nn.Conv(256, (4, 4), (2, 2), padding=1, name="enc3")(x)
        x = nn.relu(_inorm(x))
        for i in range(8):
            x = _ResBlock(name=f"res{i}")(x)
        x = _TorchConvT(128, name="dec1")(x)
        x = nn.relu(_inorm(x))
        x = _TorchConvT(64, name="dec2")(x)
        x = nn.relu(_inorm(x))
        return nn.Conv(self.out_channels, (7, 7), padding=0,
                       name="out")(_rpad(x, 3))


class EdgeGenerator(nn.Module):
    """Edges in the hole from [masked grayscale, masked edges, mask]
    (3 channels NHWC) -> edge probability map (1 channel, sigmoid)."""

    @nn.compact
    def __call__(self, x):
        return nn.sigmoid(_Backbone(1, name="bb")(x))


class InpaintGenerator(nn.Module):
    """RGB fill from [masked rgb, composed edges] (4 channels NHWC) ->
    RGB in [0, 1] ((tanh + 1) / 2, EdgeConnect's output scaling)."""

    @nn.compact
    def __call__(self, x):
        return (jnp.tanh(_Backbone(3, name="bb")(x)) + 1.0) / 2.0


# ---------------------------------------------------------------------------
# checkpoint conversion
# ---------------------------------------------------------------------------

# torch nn.Sequential indices in EdgeConnect's generators -> our names.
# encoder: [pad, conv64, IN, relu, conv128, IN, relu, conv256, IN, relu]
# decoder: [convT128, IN, relu, convT64, IN, relu, pad, conv_out]
_ENC = {"1": "enc1", "4": "enc2", "7": "enc3"}
_DEC = {"0": "dec1", "3": "dec2", "7": "out"}


def _resolve_spectral(sd: Dict, base: str):
    """weight for `base`, resolving spectral-norm reparameterization."""
    import torch

    if f"{base}.weight" in sd:
        return sd[f"{base}.weight"]
    w = sd[f"{base}.weight_orig"]
    u = sd[f"{base}.weight_u"]
    v = sd[f"{base}.weight_v"]
    wm = w.reshape(w.shape[0], -1)
    sigma = torch.dot(u, torch.mv(wm, v))
    return w / sigma


def convert_edgeconnect_gen(sd: Dict, kind: str) -> Dict:
    """EdgeConnect generator state_dict -> flax variables.

    :param sd: torch state_dict (an `EdgeModel_gen.pth`-style checkpoint
        stores {'iteration': ..., 'generator': sd} — pass either).
    :param kind: 'edge' | 'inpaint'.
    """
    if "generator" in sd and not any("." in k for k in list(sd)[:2]):
        sd = sd["generator"]

    def conv(base, transpose=False):
        w = np.asarray(_resolve_spectral(sd, base).detach().cpu().numpy(),
                       np.float32)
        b = np.asarray(sd[f"{base}.bias"].detach().cpu().numpy(),
                       np.float32)
        if transpose:
            # torch convT weight (Cin, Cout, kh, kw) -> HWOI... stored as
            # our param layout (kh, kw, Cout, Cin)
            return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
        # torch conv (Cout, Cin, kh, kw) -> HWIO
        return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}

    bb: Dict = {}
    for idx, name in _ENC.items():
        bb[name] = conv(f"encoder.{idx}")
    for i in range(8):
        bb[f"res{i}"] = {
            # conv_block: [pad, (sn)conv dil2, IN, relu, pad, (sn)conv, IN]
            "conv1": conv(f"middle.{i}.conv_block.1"),
            "conv2": conv(f"middle.{i}.conv_block.5"),
        }
    for idx, name in _DEC.items():
        bb[name] = conv(f"decoder.{idx}", transpose=(name != "out"))
    return {"params": {"bb": bb}}


# ---------------------------------------------------------------------------
# MODEL=3 test pipeline
# ---------------------------------------------------------------------------

def canny_edges(gray: np.ndarray, sigma: float = 2.0) -> np.ndarray:
    """Canny edge map on [0,1] grayscale (H, W) — scipy.ndimage
    implementation (gaussian gradient -> non-max suppression ->
    hysteresis), standing in for skimage.feature.canny which EdgeConnect
    uses for the known-region edges."""
    from scipy import ndimage as ndi

    g = ndi.gaussian_filter(gray.astype(np.float64), sigma)
    gx = ndi.sobel(g, axis=1)
    gy = ndi.sobel(g, axis=0)
    mag = np.hypot(gx, gy)
    if mag.max() > 0:
        mag = mag / mag.max()
    ang = (np.rad2deg(np.arctan2(gy, gx)) + 180.0) % 180.0
    # non-maximum suppression over the 4 quantized directions
    q = np.zeros_like(mag)
    h, w = mag.shape
    pad = np.pad(mag, 1)
    dirs = [((0, 1), (0, -1)), ((1, 1), (-1, -1)),
            ((1, 0), (-1, 0)), ((1, -1), (-1, 1))]
    bins = (((ang + 22.5) // 45).astype(int)) % 4
    for b, ((dy1, dx1), (dy2, dx2)) in enumerate(dirs):
        n1 = pad[1 + dy1:h + 1 + dy1, 1 + dx1:w + 1 + dx1]
        n2 = pad[1 + dy2:h + 1 + dy2, 1 + dx2:w + 1 + dx2]
        keep = (bins == b) & (mag >= n1) & (mag >= n2)
        q[keep] = mag[keep]
    lo, hi = 0.1, 0.2
    strong = q >= hi
    weak = q >= lo
    # hysteresis: weak pixels connected to strong survive
    lbl, n = ndi.label(weak)
    if n:
        keep_ids = np.unique(lbl[strong])
        out = np.isin(lbl, keep_ids[keep_ids > 0]) & weak
    else:
        out = strong
    return out.astype(np.float32)


def make_edgeconnect_inpaint_fn(edge_vars, inpaint_vars, mask: np.ndarray,
                                sigma: float = 2.0):
    """The reference InpaintOperator's `model.test(img, mask)` as an
    `inpaint_fn(img (B,3,H,W) in [0,1]) -> (B,3,H,W)` closure for the
    operator bank's inpaint slot (mask: (1,1,H,W) or (H,W), 1 = hole).

    Pipeline (EdgeConnect MODEL=3): gray/canny on the host per image ->
    EdgeGenerator fills hole edges -> InpaintGenerator fills RGB ->
    composite out*mask + img*(1-mask).
    """
    edge_model = EdgeGenerator()
    inp_model = InpaintGenerator()
    m = np.asarray(mask, np.float32).reshape(
        np.asarray(mask).shape[-2:])                      # (H, W)

    @jax.jit
    def run(ein, iin_rgb, e_canny):
        edges = edge_model.apply(edge_vars, ein)
        # EdgeConnect's eval/sample paths composite predicted edges with
        # the known-region canny edges (pred*mask + canny*(1-mask)) before
        # inpainting — known-region edge structure comes from canny.
        mm = jnp.asarray(m)[None, :, :, None]
        edges = edges * mm + e_canny * (1.0 - mm)
        x = jnp.concatenate([iin_rgb, edges], axis=-1)
        return inp_model.apply(inpaint_vars, x), edges

    def inpaint_fn(img):
        arr = np.asarray(img, np.float32)                 # (B,3,H,W)
        b = arr.shape[0]
        # skimage rgb2gray (Rec. 709 luma) — what EdgeConnect feeds the
        # edge model, NOT ITU-R 601.
        gray = (0.2125 * arr[:, 0] + 0.7154 * arr[:, 1]
                + 0.0721 * arr[:, 2])                     # (B,H,W)
        keep = 1.0 - m
        eins, iins, ecs = [], [], []
        for i in range(b):
            e = canny_edges(gray[i], sigma) * keep
            # EdgeConnect computes images_masked = img*(1-mask) + mask:
            # the hole is filled WHITE (1.0), matching the pretrained
            # models' input distribution.
            eins.append(np.stack([gray[i] * keep + m, e, m], -1))
            iins.append(arr[i].transpose(1, 2, 0) * keep[..., None]
                        + m[..., None])
            ecs.append(e[..., None])
        out, _ = run(jnp.asarray(np.stack(eins)),
                     jnp.asarray(np.stack(iins)),
                     jnp.asarray(np.stack(ecs)))
        out = jnp.transpose(out, (0, 3, 1, 2))
        comp = out * m[None, None] + jnp.asarray(arr) * (1.0 - m[None, None])
        return jnp.clip(comp, 0.0, 1.0)

    return inpaint_fn


def load_edgeconnect(edge_path: str, inpaint_path: str, mask, sigma=2.0):
    """Load EdgeConnect `EdgeModel_gen.pth` + `InpaintingModel_gen.pth`
    and return the bank-ready inpaint_fn."""
    import torch

    esd = torch.load(edge_path, map_location="cpu", weights_only=True)
    isd = torch.load(inpaint_path, map_location="cpu", weights_only=True)
    return make_edgeconnect_inpaint_fn(
        convert_edgeconnect_gen(esd, "edge"),
        convert_edgeconnect_gen(isd, "inpaint"), mask, sigma)
