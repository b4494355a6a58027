"""From-scratch ResNet vision encoder.

Semantics of the reference's actor_resnet.py (conv3x3 stride-2 stem, four
BasicBlock/Bottleneck stages each starting at stride 2, global mean pool,
fc head; reference: models/actor_resnet.py:73-107), written as flax with
NHWC convs internally (TPU-optimal layout); the public interface is NCHW
to match the framework image convention.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from t2onet_tpu.models.common import torch_linear_kernel_init

_CFG = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def _conv_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default: kaiming-uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""
    import jax

    fan_in = shape[0] * shape[1] * shape[2]  # kh * kw * cin
    lim = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -lim, lim)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype)
        conv = lambda *a, **k: nn.Conv(*a, use_bias=False,
                                       kernel_init=_conv_init,
                                       dtype=self.dtype, **k)
        y = conv(self.planes, (3, 3), (self.stride, self.stride),
                 padding=1)(x)
        y = nn.relu(norm()(y))
        y = conv(self.planes, (3, 3), padding=1)(y)
        y = norm()(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = conv(self.planes, (1, 1), (self.stride, self.stride))(x)
            x = norm()(x)
        return nn.relu(y + x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype)
        conv = lambda *a, **k: nn.Conv(*a, use_bias=False,
                                       kernel_init=_conv_init,
                                       dtype=self.dtype, **k)
        out_planes = self.planes * self.expansion
        y = conv(self.planes, (1, 1))(x)
        y = nn.relu(norm()(y))
        y = conv(self.planes, (3, 3), (self.stride, self.stride),
                 padding=1)(y)
        y = nn.relu(norm()(y))
        y = conv(out_planes, (1, 1))(y)
        y = norm()(y)
        if self.stride != 1 or x.shape[-1] != out_planes:
            # conv-ONLY projection shortcut: the reference's Bottleneck
            # deliberately omits the BatchNorm that its BasicBlock (and
            # torchvision) put after the 1x1 (actor_resnet.py:58-62 vs
            # 31-36) — parity means reproducing that quirk
            x = conv(out_planes, (1, 1), (self.stride, self.stride))(x)
        return nn.relu(y + x)


class ResNet(nn.Module):
    """ResNet(num_inputs=3, depth, num_outputs) — reference actor_resnet.py:73.

    Input NCHW (B, 3, H, W); output (B, num_outputs).
    """

    depth: int = 18
    num_outputs: int = 512
    stage_widths: Sequence[int] = (64, 128, 256, 512)
    # computation dtype; params/batch-stats stay f32 (flax param_dtype).
    # bfloat16 halves the activation HBM traffic of the hot per-step
    # vis-encode — batch stats are still reduced in f32 (flax
    # _compute_stats promotes), output is cast back to f32.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = True):
        block_kind, blocks_per_stage = _CFG[self.depth]
        block_cls = BasicBlock if block_kind == "basic" else Bottleneck
        x = jnp.transpose(img, (0, 2, 3, 1))  # NCHW -> NHWC for TPU convs
        x = x.astype(self.dtype)
        x = nn.Conv(self.stage_widths[0], (3, 3), (2, 2), padding=1,
                    use_bias=False, kernel_init=_conv_init,
                    dtype=self.dtype)(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype)(x))
        for planes, n_blocks in zip(self.stage_widths, blocks_per_stage):
            for b in range(n_blocks):
                x = block_cls(planes, stride=2 if b == 0 else 1,
                              dtype=self.dtype)(x, train)
        x = x.astype(jnp.float32)
        x = x.mean(axis=(1, 2))  # global average pool
        x = nn.Dense(self.num_outputs, kernel_init=torch_linear_kernel_init)(x)
        return x
