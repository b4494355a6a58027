"""Pix2PixHD CNN generators: GlobalGenerator / LocalEnhancer / Encoder.

Spec: reference models/seq2seqGAN/networks.py:130-291 (LocalEnhancer
networks.py:130-183, GlobalGenerator networks.py:185-214, ResnetBlock
networks.py:216-259, Encoder networks.py:261-291) and the define_G
factory (networks.py:28-41). In the reference framework these are dead
weight — the "generator" of T2ONet+D is the Actor itself — but they
complete the pix2pixHD surface for users who bring pix2pixHD
checkpoints or want a CNN image-to-image baseline.

TPU-native notes:
- All convs run NHWC (transposed at the module boundary from the
  framework-wide NCHW image convention).
- Norm is instance norm, affine=False (define_G's default and only
  call-mode, networks.py:28-35: norm='instance' ->
  InstanceNorm2d(affine=False), which has NO learnable params and uses
  per-sample statistics at train AND eval) — a pure function, no
  variable collections, so the whole generator is a stateless pytree.
- ConvTranspose2d(k=3, s=2, p=1, output_padding=1) is reproduced
  exactly with flax ConvTranspose(transpose_kernel=True) and explicit
  padding ((k-1-p), (k-1-p+output_padding)) = (1, 2): torch's
  transposed conv IS the gradient of a strided conv, which is what
  transpose_kernel selects; parity is pinned against a torch oracle in
  tests/test_pix2pixhd.py.
- The Encoder's instance-wise average pooling (networks.py:279-291 —
  a host loop over np.unique instance ids) becomes a one-hot segment
  mean over a static `n_instances` bound: jit-compatible, O(n_inst*HW)
  on the VPU, no host round-trips.

Layer names encode the torch nn.Sequential indices (m{idx}) so the
state-dict converter (convert.torch_checkpoint.convert_pix2pixhd) is a
mechanical rename.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def instance_norm(x, eps: float = 1e-5):
    """InstanceNorm2d(affine=False) on NHWC: per-sample, per-channel
    spatial standardization (torch default eps 1e-5; biased variance)."""
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _reflect_pad(x, p: int):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def _conv(feat, k, name, stride=1, pad=0):
    # torch Conv2d(k, stride, padding=pad) with both weight and bias
    return nn.Conv(feat, (k, k), (stride, stride), padding=pad, name=name)


def _conv_transpose(feat, name):
    # torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1): lo pad
    # k-1-p = 1, hi pad k-1-p+outpad = 2, kernel flipped/transposed
    return nn.ConvTranspose(feat, (3, 3), (2, 2), padding=((1, 2), (1, 2)),
                            transpose_kernel=True, name=name)


class ResnetBlock(nn.Module):
    """Reflect-padded 3x3 conv block with residual (networks.py:216-259);
    conv names c1/c5 = the conv_block Sequential indices."""

    dim: int

    @nn.compact
    def __call__(self, x):
        h = _reflect_pad(x, 1)
        h = _conv(self.dim, 3, "c1")(h)
        h = nn.relu(instance_norm(h))
        h = _reflect_pad(h, 1)
        h = _conv(self.dim, 3, "c5")(h)
        return x + instance_norm(h)


class GlobalGenerator(nn.Module):
    """Coarse generator (networks.py:185-214). NCHW in [-1,1]-style
    images in, tanh image out. With extract_features=True the final
    [pad, conv7x7, tanh] is skipped (the LocalEnhancer consumes the
    ngf-channel feature map, networks.py:138-140)."""

    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9

    @nn.compact
    def __call__(self, x, extract_features: bool = False):
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = _reflect_pad(h, 3)
        h = nn.relu(instance_norm(_conv(self.ngf, 7, "m1")(h)))
        idx = 4
        for i in range(self.n_downsampling):
            h = _conv(self.ngf * 2 ** (i + 1), 3, f"m{idx}", stride=2,
                      pad=1)(h)
            h = nn.relu(instance_norm(h))
            idx += 3
        for _ in range(self.n_blocks):
            h = ResnetBlock(self.ngf * 2 ** self.n_downsampling,
                            name=f"m{idx}")(h)
            idx += 1
        for i in range(self.n_downsampling):
            h = _conv_transpose(
                self.ngf * 2 ** (self.n_downsampling - i - 1), f"m{idx}")(h)
            h = nn.relu(instance_norm(h))
            idx += 3
        if extract_features:
            return jnp.transpose(h, (0, 3, 1, 2))
        h = _reflect_pad(h, 3)
        h = jnp.tanh(_conv(self.output_nc, 7, f"m{idx + 1}")(h))
        return jnp.transpose(h, (0, 3, 1, 2))


class LocalEnhancer(nn.Module):
    """Coarse-to-fine generator (networks.py:130-183): a trimmed
    GlobalGenerator on the 2x-downsampled input plus one (or more)
    enhancer branches that add the coarse features into a local
    downsample->resblocks->upsample path."""

    output_nc: int = 3
    ngf: int = 32
    n_downsample_global: int = 3
    n_blocks_global: int = 9
    n_local_enhancers: int = 1
    n_blocks_local: int = 3

    @nn.compact
    def __call__(self, x):
        # input pyramid: AvgPool2d(3, s2, p1, count_include_pad=False)
        # (networks.py:166-170)
        pyramid = [x]
        for _ in range(self.n_local_enhancers):
            pyramid.append(_avg_pool_3s2_nchw(pyramid[-1]))

        ngf_g = self.ngf * 2 ** self.n_local_enhancers
        coarse = GlobalGenerator(
            output_nc=self.output_nc, ngf=ngf_g,
            n_downsampling=self.n_downsample_global,
            n_blocks=self.n_blocks_global, name="model")(
                pyramid[-1], extract_features=True)

        out = coarse
        for n in range(1, self.n_local_enhancers + 1):
            ngf_l = self.ngf * 2 ** (self.n_local_enhancers - n)
            inp = pyramid[self.n_local_enhancers - n]
            h = jnp.transpose(inp, (0, 2, 3, 1))
            h = _reflect_pad(h, 3)
            h = nn.relu(instance_norm(
                _conv(ngf_l, 7, f"model{n}_1_m1")(h)))
            h = _conv(ngf_l * 2, 3, f"model{n}_1_m4", stride=2, pad=1)(h)
            h = nn.relu(instance_norm(h))
            h = h + jnp.transpose(out, (0, 2, 3, 1))
            for i in range(self.n_blocks_local):
                h = ResnetBlock(ngf_l * 2, name=f"model{n}_2_m{i}")(h)
            h = _conv_transpose(ngf_l, f"model{n}_2_m{self.n_blocks_local}")(h)
            h = nn.relu(instance_norm(h))
            if n == self.n_local_enhancers:
                h = _reflect_pad(h, 3)
                h = jnp.tanh(_conv(
                    self.output_nc, 7,
                    f"model{n}_2_m{self.n_blocks_local + 4}")(h))
            out = jnp.transpose(h, (0, 3, 1, 2))
        return out


class Encoder(nn.Module):
    """Instance-feature encoder (networks.py:261-291): conv down/up to
    output_nc feature planes, then instance-wise average pooling so
    every pixel of an instance carries that instance's mean feature.

    The reference's host loop over np.unique(inst) becomes a
    jit-compatible segment mean over `jnp.unique(..., size=n_instances)`:
    ids may be ARBITRARY integers (e.g. the pix2pixHD cityscapes
    convention class*1000+index, ids like 26002) — only the number of
    DISTINCT ids per image is bounded by the static `n_instances`.
    Images with more distinct ids than that lose the overflow ids'
    pixels to zeros (matching one-hot-out-of-range semantics); raise
    `n_instances` to cover the data."""

    output_nc: int = 3
    ngf: int = 32
    n_downsampling: int = 4
    n_instances: int = 32

    @nn.compact
    def __call__(self, x, inst):
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = _reflect_pad(h, 3)
        h = nn.relu(instance_norm(_conv(self.ngf, 7, "m1")(h)))
        idx = 4
        for i in range(self.n_downsampling):
            h = _conv(self.ngf * 2 ** (i + 1), 3, f"m{idx}", stride=2,
                      pad=1)(h)
            h = nn.relu(instance_norm(h))
            idx += 3
        for i in range(self.n_downsampling):
            h = _conv_transpose(
                self.ngf * 2 ** (self.n_downsampling - i - 1), f"m{idx}")(h)
            h = nn.relu(instance_norm(h))
            idx += 3
        h = _reflect_pad(h, 3)
        h = jnp.tanh(_conv(self.output_nc, 7, f"m{idx + 1}")(h))
        out = jnp.transpose(h, (0, 3, 1, 2))          # (B, C, H, W)

        # instance-wise average pooling (networks.py:279-291): per image,
        # compact the arbitrary id VALUES to dense slots via sized unique
        # (fill slot value -1 never matches a real id)
        inst = inst.reshape(inst.shape[0], inst.shape[-2],
                            inst.shape[-1]).astype(jnp.int32)

        def pool_one(feat, ids):                      # (C,H,W), (H,W)
            uniq = jnp.unique(ids, size=self.n_instances,
                              fill_value=-1)          # (N,)
            onehot = (ids[:, :, None] == uniq[None, None, :]
                      ).astype(feat.dtype)            # (H, W, N)
            counts = onehot.sum(axis=(0, 1))          # (N,)
            sums = jnp.einsum("chw,hwn->cn", feat, onehot)
            means = sums / jnp.maximum(counts[None, :], 1.0)
            return jnp.einsum("cn,hwn->chw", means, onehot)

        return jax.vmap(pool_one)(out, inst)


def _avg_pool_3s2_nchw(x):
    from t2onet_tpu.models.gan import _avg_pool_3s2

    return _avg_pool_3s2(x)


def define_generator(net_g: str = "global", **kw):
    """Factory mirroring define_G (networks.py:28-41)."""
    if net_g == "global":
        return GlobalGenerator(**kw)
    if net_g == "local":
        return LocalEnhancer(**kw)
    if net_g == "encoder":
        return Encoder(**kw)
    raise ValueError(f"unknown generator kind {net_g!r} "
                     "(want global | local | encoder)")
