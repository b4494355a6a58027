"""InceptionV3 pool3 feature extractor for FID, in flax.

Capability spec: reference utils/FID/inception.py (torchvision InceptionV3
wrapped to emit 2048-d pool3 activations, with bilinear resize to 299 and
[-1,1] normalization; fid_score.py:138-156). Pretrained weights are not
redistributable/downloadable in this environment, so this module provides:

- the torchvision-compatible architecture in flax,
- a converter from a torchvision `inception_v3` state_dict (the user
  supplies the .pth), and
- `make_features_fn(...)` producing the `features_fn` the ImageEvaluator
  consumes.

Naming matches torchvision so conversion is purely mechanical
(`X.conv.weight` -> params[X]['conv']['kernel'], `X.bn.*` -> BatchNorm).
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
    out: int
    kernel: Sequence[int]
    stride: int = 1
    padding: Sequence = (0, 0)

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = (pad, pad)
        x = nn.Conv(self.out, tuple(self.kernel),
                    (self.stride, self.stride),
                    padding=[(pad[0], pad[0]), (pad[1], pad[1])],
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


def _branch_pool(x, mode: str):
    """The 3x3 stride-1 branch pool, in its three historical flavors.

    'avg_tv'  torchvision InceptionA/C/E: average INCLUDING the zero pad
              (count_include_pad=True, the torch default).
    'avg_tf'  pytorch-fid FIDInceptionA/C/E_1: average EXCLUDING the pad
              (reference utils/FID/inception.py:210-212, 239-241, 271-273).
    'max'     pytorch-fid FIDInceptionE_2 (Mixed_7c): max pool — "likely
              an error" in the original TF FID model but load-bearing for
              comparable FID numbers (reference inception.py:299-305).
    """
    if mode == "max":
        return nn.max_pool(x, (3, 3), (1, 1), padding=[(1, 1), (1, 1)])
    s = nn.avg_pool(x, (3, 3), (1, 1), padding=[(1, 1), (1, 1)])
    if mode == "avg_tv":
        return s
    ones = jnp.ones_like(x[..., :1])
    c = nn.avg_pool(ones, (3, 3), (1, 1), padding=[(1, 1), (1, 1)])
    return s / c          # count_include_pad=False semantics


class InceptionA(nn.Module):
    pool_features: int
    pool_mode: str = "avg_tv"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1),
                         name="branch_pool")(_branch_pool(x, self.pool_mode))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    pool_mode: str = "avg_tv"

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1),
                         name="branch_pool")(_branch_pool(x, self.pool_mode))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg_tv"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = BasicConv2d(192, (1, 1),
                         name="branch_pool")(_branch_pool(x, self.pool_mode))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Backbone up to the final 2048-d average pool (no fc/aux).

    fid_variant=True reproduces pytorch-fid's patched `fid_inception_v3`
    — the reference's DEFAULT FID protocol (use_fid_inception=True,
    reference utils/FID/inception.py:36, 79, 166-190): TF-style
    pad-excluding average branch pools in Mixed_5*/6b-e/7b and a MAX
    branch pool in Mixed_7c (inception.py:279-307). Weight-compatible with
    the pt_inception-2015-12-05 state_dict (torchvision key naming,
    num_classes=1008, no aux). False = plain torchvision inception_v3.
    """

    fid_variant: bool = False

    @nn.compact
    def __call__(self, x_nchw):
        avg = "avg_tf" if self.fid_variant else "avg_tv"
        e2 = "max" if self.fid_variant else "avg_tv"
        x = jnp.transpose(x_nchw, (0, 2, 3, 1))
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = InceptionA(32, pool_mode=avg, name="Mixed_5b")(x)
        x = InceptionA(64, pool_mode=avg, name="Mixed_5c")(x)
        x = InceptionA(64, pool_mode=avg, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, pool_mode=avg, name="Mixed_6b")(x)
        x = InceptionC(160, pool_mode=avg, name="Mixed_6c")(x)
        x = InceptionC(160, pool_mode=avg, name="Mixed_6d")(x)
        x = InceptionC(192, pool_mode=avg, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool_mode=avg, name="Mixed_7b")(x)
        x = InceptionE(pool_mode=e2, name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))          # (B, 2048) pool3


def convert_torchvision_inception(sd: Dict) -> Dict:
    """torchvision inception_v3 state_dict -> flax params/batch_stats.

    Mechanical: 'A.B.conv.weight' -> params[A][B]['conv']['kernel'] (OIHW ->
    HWIO); 'A.B.bn.{weight,bias}' -> BatchNorm scale/bias; running stats ->
    batch_stats. fc / AuxLogits entries are ignored.
    """
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for key, val in sd.items():
        v = np.asarray(val.detach().cpu().numpy()
                       if hasattr(val, "detach") else val, np.float32)
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits"):
            continue
        mod_path, kind, name = parts[:-2], parts[-2], parts[-1]
        if kind == "conv" and name == "weight":
            put(params, mod_path + ["conv", "kernel"],
                v.transpose(2, 3, 1, 0))
        elif kind == "bn" and name == "weight":
            put(params, mod_path + ["bn", "scale"], v)
        elif kind == "bn" and name == "bias":
            put(params, mod_path + ["bn", "bias"], v)
        elif kind == "bn" and name == "running_mean":
            put(stats, mod_path + ["bn", "mean"], v)
        elif kind == "bn" and name == "running_var":
            put(stats, mod_path + ["bn", "var"], v)
    return {"params": params, "batch_stats": stats}


def make_features_fn(variables, resize: bool = True,
                     normalize: bool = True, fid_variant: bool = False):
    """Build the (N,3,H,W) in [0,1] -> (N, 2048) extractor the
    ImageEvaluator consumes (reference fid_score.py:138-156 protocol:
    bilinear resize to 299, scale to [-1, 1])."""
    model = InceptionV3Features(fid_variant=fid_variant)

    @jax.jit
    def run(x):
        if normalize:
            x = 2.0 * x - 1.0
        return model.apply(variables, x)

    def features(imgs):
        # resize OUTSIDE the jitted network: native-resolution eval feeds
        # per-sample shapes, and a shape-polymorphic jit would recompile
        # the full 20M-param InceptionV3 per distinct aspect ratio. The
        # eager resize costs one tiny compile per shape; `run` compiles
        # once at the fixed (N, 3, 299, 299).
        if resize and imgs.shape[-2:] != (299, 299):
            # antialias=False: the reference protocol is pytorch-fid's
            # F.interpolate(mode='bilinear') which does NOT antialias;
            # jax.image.resize defaults to antialias=True and would widen
            # the kernel on the downsample, shifting pool3 features
            imgs = jax.image.resize(
                imgs, (imgs.shape[0], 3, 299, 299), "bilinear",
                antialias=False)
        return run(imgs)

    return features


def export_torchvision_inception(variables: Dict) -> Dict:
    """flax params/batch_stats -> a torchvision-named inception state_dict.

    Exact inverse of `convert_torchvision_inception` (HWIO -> OIHW,
    scale/bias -> bn.weight/bias, mean/var -> running stats). Used to
    manufacture a valid `.pth` locally — e.g. random-init weights to prove
    the `--fid_inception_ckpt` eval path end-to-end where the pretrained
    pt_inception download is unreachable (reference fid_score.py:138-156)."""
    import torch

    out: Dict = {}

    def walk(tree, path, kind):
        for name, node in tree.items():
            if not isinstance(node, dict):
                prefix = ".".join(path[:-1]) if len(path) > 1 else ""
                mod = (prefix + "." if prefix else "") + path[-1]
                v = np.asarray(node, np.float32)
                if path[-1] == "conv" and name == "kernel":
                    out[f"{mod}.weight"] = torch.from_numpy(
                        v.transpose(3, 2, 0, 1).copy())
                elif path[-1] == "bn":
                    tv = {"scale": "weight", "bias": "bias",
                          "mean": "running_mean", "var": "running_var"}[name]
                    out[f"{mod}.{tv}"] = torch.from_numpy(v.copy())
            else:
                walk(node, path + [name], kind)

    walk(variables["params"], [], "params")
    walk(variables["batch_stats"], [], "stats")
    return out


def make_random_inception_pth(path: str, seed: int = 0) -> None:
    """Write a random-init torchvision-named inception `.pth`.

    Stands in for the undownloadable pt_inception-2015-12-05 weights to
    drive the full FID eval seam (load -> convert -> extract -> Frechet);
    FID numbers from it are architecture-valid but not comparable to
    published FIDs."""
    import torch

    model = InceptionV3Features()
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 3, 299, 299), jnp.float32))
    # BN running stats init to mean 0 / var 1; conv kernels keep the
    # flax lecun-normal init (non-degenerate features without extra
    # randomization).
    torch.save(export_torchvision_inception(
        jax.tree.map(np.asarray, dict(variables))), path)


def load_fid_inception(path: str, fid_variant: bool = True):
    """Load an inception .pth and return a features_fn.

    fid_variant=True (default, matching the reference's
    use_fid_inception=True) expects the pt_inception-2015-12-05 weights
    (pytorch-fid's FID_WEIGHTS_URL) and runs the patched architecture;
    False expects torchvision's inception_v3 weights. Both state_dicts use
    torchvision key naming, so one converter serves both."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return make_features_fn(convert_torchvision_inception(sd),
                            fid_variant=fid_variant)
