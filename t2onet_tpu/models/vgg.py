"""VGG19 perceptual feature extractor + VGGLoss, in flax.

Behavioral spec: reference models/seq2seqGAN/networks.py:427-461 (Vgg19 —
five slices of torchvision vgg19.features ending at relu1_1, relu2_1,
relu3_1, relu4_1, relu5_1, with ImageNet mean/std normalization of a
[0,1] RGB input) and networks.py:113-125 (VGGLoss — weighted L1 over the
slice features, weights [1/32, 1/16, 1/8, 1/4, 1], target detached).

Pretrained weights are not redistributable/downloadable in this
environment, so like evals/inception.py this module ships the
architecture + a mechanical converter from a torchvision `vgg19`
state_dict ('features.N.weight' keys); the user supplies the .pth.
"""

from __future__ import annotations

from typing import Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg19.features conv layer indices and output widths, up to
# relu5_1 (index 29) — all the reference slices consume
_CONV_LAYERS = [
    (0, 64), (2, 64), (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256), (16, 256),
    (19, 512), (21, 512), (23, 512), (25, 512), (28, 512),
]
# features.N index ranges per slice (reference networks.py:436-445);
# a maxpool precedes the first conv of slices 2..5 interior as in
# torchvision's layout (pools at indices 4, 9, 18, 27)
_SLICE_ENDS = (2, 7, 12, 21, 30)

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)

VGG_LOSS_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


class Vgg19Features(nn.Module):
    """[0,1] RGB NCHW -> [relu1_1, relu2_1, relu3_1, relu4_1, relu5_1]
    (each NCHW, matching the torch slice outputs)."""

    @nn.compact
    def __call__(self, x_nchw) -> List[jax.Array]:
        x = jnp.transpose(x_nchw, (0, 2, 3, 1))
        x = (x - _MEAN) / _STD
        convs = {i: nn.Conv(w, (3, 3), padding=[(1, 1), (1, 1)],
                            name=f"conv{i}")
                 for i, w in _CONV_LAYERS}
        pools = {4, 9, 18, 27}
        outs = []
        slice_iter = iter(_SLICE_ENDS)
        next_end = next(slice_iter)
        for idx in range(30):
            if idx in convs:
                x = convs[idx](x)
            elif idx in pools:
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:                      # ReLU indices
                x = nn.relu(x)
            if idx + 1 == next_end:
                outs.append(jnp.transpose(x, (0, 3, 1, 2)))
                next_end = next(slice_iter, None)
        return outs


def convert_torchvision_vgg19(sd: Dict) -> Dict:
    """torchvision vgg19 state_dict -> flax params.

    'features.N.weight' (OIHW) -> params['convN']['kernel'] (HWIO);
    classifier entries are ignored."""
    params: Dict = {}
    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] != "features":
            continue
        idx = int(parts[1])
        if idx >= 30:
            continue
        v = np.asarray(val.detach().cpu().numpy()
                       if hasattr(val, "detach") else val, np.float32)
        node = params.setdefault(f"conv{idx}", {})
        if parts[2] == "weight":
            node["kernel"] = v.transpose(2, 3, 1, 0)
        else:
            node["bias"] = v
    return {"params": params}


def make_vgg_loss(variables, weights=VGG_LOSS_WEIGHTS):
    """The reference VGGLoss as a pure fn: perceptual_fn(x, y) ->
    sum_i w_i * L1(vgg_i(x), stop_grad(vgg_i(y)))
    (reference networks.py:119-125). Plugs into GanLosses(perceptual_fn=)
    as the G_VGG term."""
    model = Vgg19Features()

    def perceptual_fn(x, y):
        fx = model.apply(variables, x)
        # the target branch is detached once, here (reference detaches
        # per-feature, networks.py:124 — same effect)
        fy = model.apply(variables, jax.lax.stop_gradient(y))
        loss = jnp.zeros(())
        for w, a, b in zip(weights, fx, fy):
            loss = loss + w * jnp.abs(a - b).mean()
        return loss

    return perceptual_fn


def load_vgg19(path: str):
    """Load a torchvision vgg19 .pth and return (variables, perceptual_fn)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    variables = convert_torchvision_vgg19(sd)
    return variables, make_vgg_loss(variables)
