"""First-party inpainting backend for the inpaint operator slot.

The reference's InpaintOperator delegates to an external pretrained
EdgeConnect model (`self.model.test(img, self.mask)`, reference:
models/operators.py:625-682) whose git submodule is not even vendored —
the operator is a *slot*. This module fills that slot with a first-party,
TPU-trainable free-form inpainting generator so the framework is
self-contained: gated convolutions (feature * sigmoid(gate), the
DeepFill-v2 mechanism, which handles arbitrary hole shapes better than
vanilla convs) around a dilated bottleneck (EdgeConnect's receptive-field
recipe). Everything is static-shape, NHWC convs inside, jit/vmap/pjit
friendly; no normalization layers, so there is no train/eval state split
and the apply is a pure function of (params, img, mask).

Convention (matches the operator library): img (B, 3, H, W) f32 in [0,1];
mask (B, 1, H, W) with 1 = region to fill (the region the executor's
mask-blend writes, reference operators.py:129-130).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class GatedConv(nn.Module):
    """Conv emitting 2F channels split into feature/gate:
    out = elu(feature) * sigmoid(gate)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        pad = self.dilation * (k - 1) // 2
        y = nn.Conv(2 * self.features, (k, k), (self.stride, self.stride),
                    padding=pad, kernel_dilation=(self.dilation, self.dilation))(x)
        feat, gate = jnp.split(y, 2, axis=-1)
        return nn.elu(feat) * nn.sigmoid(gate)


def _upsample2(x):
    """Nearest-neighbor 2x upsample, NHWC (resize-then-conv avoids the
    checkerboard artifacts of transposed convs)."""
    b, h, w, c = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
    ).reshape(b, 2 * h, 2 * w, c)


class InpaintNet(nn.Module):
    """Free-form inpainting generator.

    Coarse single-stage: gated-conv encoder (two stride-2 stages), dilated
    gated bottleneck, nearest-upsample decoder, sigmoid RGB head. H and W
    must be multiples of 4.
    """

    features: int = 32
    dilations: Sequence[int] = (2, 4, 8, 2)

    @nn.compact
    def __call__(self, img, mask):
        """img (B, 3, H, W), mask (B, 1, H, W) -> raw prediction (B, 3, H, W)
        (full image; callers compose with :func:`compose`)."""
        f = self.features
        holed = img * (1.0 - mask)
        x = jnp.concatenate([holed, mask.astype(img.dtype)], axis=1)
        x = jnp.transpose(x, (0, 2, 3, 1))            # NCHW -> NHWC
        x = GatedConv(f, kernel=5)(x)
        x = GatedConv(2 * f, stride=2)(x)
        x = GatedConv(2 * f)(x)
        x = GatedConv(4 * f, stride=2)(x)
        for d in self.dilations:
            x = x + GatedConv(4 * f, dilation=d)(x)   # residual dilated block
        x = _upsample2(x)
        x = GatedConv(2 * f)(x)
        x = _upsample2(x)
        x = GatedConv(f)(x)
        x = nn.Conv(3, (3, 3), padding=1)(x)
        return nn.sigmoid(jnp.transpose(x, (0, 3, 1, 2)))


def compose(pred, img, mask):
    """Keep the valid region from the input, fill the hole from the net."""
    return img * (1.0 - mask) + pred * mask


def make_inpaint_fn(net: InpaintNet, variables, mask):
    """Build the ``inpaint_fn(img)`` closure the operator bank expects
    (ops/operators.py:inpaint); the mask is captured, matching the
    reference operator's externally-set ``self.mask``. The mask
    broadcasts over the image batch, so one (1, 1, H, W) pair mask
    serves every beam row in the planner."""
    import jax.numpy as jnp

    def inpaint_fn(img):
        m = jnp.broadcast_to(jnp.asarray(mask),
                             (img.shape[0], 1) + img.shape[2:])
        return compose(net.apply(variables, img, m), img, m)

    return inpaint_fn


def inpaint_loss(pred, target, mask, hole_weight: float = 6.0):
    """Weighted reconstruction L1: the hole counts ``hole_weight`` x the
    valid region (the standard free-form inpainting weighting)."""
    err = jnp.abs(pred - target)
    hole = (err * mask).sum() / (mask.sum() * err.shape[1] + 1e-8)
    valid = (err * (1.0 - mask)).sum() / (
        (1.0 - mask).sum() * err.shape[1] + 1e-8)
    return hole_weight * hole + valid


def random_freeform_masks(rng: np.random.Generator, batch: int, h: int,
                          w: int, max_strokes: int = 4) -> np.ndarray:
    """Random free-form training masks: thick polyline strokes plus an
    occasional rectangle, (B, 1, H, W) f32 in {0, 1}. Host-side numpy —
    this is data-pipeline code, not device code."""
    masks = np.zeros((batch, 1, h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for b in range(batch):
        for _ in range(rng.integers(1, max_strokes + 1)):
            if rng.uniform() < 0.3:                   # rectangle
                y0, x0 = rng.integers(0, h // 2), rng.integers(0, w // 2)
                y1 = y0 + rng.integers(h // 8 + 1, h // 2 + 1)
                x1 = x0 + rng.integers(w // 8 + 1, w // 2 + 1)
                masks[b, 0, y0:y1, x0:x1] = 1.0
            else:                                     # thick polyline
                n_pts = rng.integers(2, 5)
                pts = np.stack([rng.integers(0, h, n_pts),
                                rng.integers(0, w, n_pts)], 1)
                thick = rng.integers(max(h // 16, 2), max(h // 6, 3))
                for (y0, x0), (y1, x1) in zip(pts[:-1], pts[1:]):
                    steps = max(abs(y1 - y0), abs(x1 - x0), 1)
                    for t in np.linspace(0.0, 1.0, steps + 1):
                        cy = y0 + t * (y1 - y0)
                        cx = x0 + t * (x1 - x0)
                        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
                        masks[b, 0][d2 <= thick ** 2] = 1.0
    return masks


def save_inpaint(path: str, net: InpaintNet, variables) -> None:
    """Persist (architecture hyperparams, params) with orbax."""
    import json
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "params"), variables, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "arch.json"), "w") as f:
        json.dump({"features": net.features,
                   "dilations": list(net.dilations)}, f)


def load_inpaint(path: str):
    """Returns (net, variables) saved by :func:`save_inpaint`."""
    import json
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "arch.json")) as f:
        arch = json.load(f)
    net = InpaintNet(features=arch["features"],
                     dilations=tuple(arch["dilations"]))
    sample = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 3, 8, 8)), jnp.zeros((1, 1, 8, 8)))
    ckptr = ocp.StandardCheckpointer()
    variables = ckptr.restore(os.path.join(path, "params"), sample)
    return net, variables


def make_train_step(net: InpaintNet, tx):
    """Jitted self-supervised step: reconstruct images through random
    holes. Returns step(params, opt_state, img, mask) -> (params,
    opt_state, loss)."""
    import optax

    @jax.jit
    def step(params, opt_state, img, mask):
        def loss_fn(p):
            pred = net.apply(p, img, mask)
            return inpaint_loss(pred, img, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step
