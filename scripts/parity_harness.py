"""End-to-end episode parity harness vs the PyTorch reference (SURVEY.md §4c).

Runs BOTH frameworks on identical inputs and asserts agreement:

1. installs import shims for the reference's missing deps — ``kornia``
   (only used for RGB<->HSV, reference models/operators.py:278-282,
   432-438, 474-478) and the unvendored ``pyutils.edgeconnect`` submodule
   (reference models/operators.py:16-17, 631-649; the inpaint op is
   blocked by the episode op mask, actor.py:211, so an identity stub is
   faithful for every reachable path),
2. builds the reference Actor from its OWN options defaults and REAL
   vocab/GloVe files (data/language/FiveK_vocabs_sess_1.json + _glove_feat
   h5), converts its randomly-initialized state_dict through
   convert_state_dict, and loads it into the t2onet_tpu Actor,
3. feeds identical (image, request) batches through the reference
   ``Actor.episode_forward`` (reference models/actor.py:184-284) and our
   ``Actor.episode`` (greedy, argmax), and asserts
   - per-step op choices are IDENTICAL, and
   - every per-step image agrees within ``--tol`` (default 1e-3) max-L1.

Requests are taken from the reference's real annotation files
(data/FiveK/annotations/*_sess_1.json request_idx rows) so the comparison
exercises the real 918-token vocab, padding, and GloVe rows.

  python scripts/parity_harness.py [--reference /root/reference]
      [--checkpoint model.pth] [--batch 4] [--img_size 48]

Exit code 0 = parity holds. Also importable: tests/test_ref_parity.py
wraps run_parity() as an automated test.
"""

import argparse
import json
import math
import os
import sys
import tempfile
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


# ---------------------------------------------------------------------------
# reference-dependency shims
# ---------------------------------------------------------------------------

def _make_kornia_shim():
    """A torch implementation of kornia's rgb_to_hsv / hsv_to_rgb.

    Matches kornia >= 0.6 semantics: H in radians [0, 2pi), S and V in
    [0, 1]. Only these two functions are used by the reference
    (models/operators.py:278-282, 432-438, 474-478).
    """
    import torch

    mod = types.ModuleType("kornia")

    def rgb_to_hsv(image, eps: float = 1e-8):
        max_rgb, argmax_rgb = image.max(-3)
        min_rgb, _ = image.min(-3)
        deltac = max_rgb - min_rgb
        v = max_rgb
        s = deltac / (max_rgb + eps)
        deltac = torch.where(deltac == 0, torch.ones_like(deltac), deltac)
        rc, gc, bc = torch.unbind(max_rgb.unsqueeze(-3) - image, dim=-3)
        h1 = bc - gc
        h2 = (rc - bc) + 2.0 * deltac
        h3 = (gc - rc) + 4.0 * deltac
        h = torch.stack((h1, h2, h3), dim=-3) / deltac.unsqueeze(-3)
        h = torch.gather(h, dim=-3, index=argmax_rgb.unsqueeze(-3)).squeeze(-3)
        h = (h / 6.0) % 1.0
        h = 2.0 * math.pi * h
        return torch.stack((h, s, v), dim=-3)

    def hsv_to_rgb(image):
        h = image[..., 0, :, :] / (2.0 * math.pi)
        s = image[..., 1, :, :]
        v = image[..., 2, :, :]
        hi = torch.floor(h * 6) % 6
        f = ((h * 6) % 6) - hi
        one = torch.tensor(1.0, device=image.device, dtype=image.dtype)
        p = v * (one - s)
        q = v * (one - f * s)
        t = v * (one - (one - f) * s)
        hi = hi.long()
        indices = torch.stack([hi, hi + 6, hi + 12], dim=-3)
        out = torch.stack((v, q, p, p, t, v,
                           t, v, v, q, p, p,
                           p, p, t, v, v, q), dim=-3)
        return torch.gather(out, -3, indices)

    mod.rgb_to_hsv = rgb_to_hsv
    mod.hsv_to_rgb = hsv_to_rgb
    return mod


def _make_edgeconnect_shim():
    """Stub pyutils.edgeconnect: identity inpainting.

    The reference InpaintOperator builds an EdgeConnect model at Executor
    construction (models/operators.py:631-649) from an unvendored git
    submodule; the op itself is masked off in episode_forward
    (actor.py:211) and excluded from FiveK planning
    (gen_greedy_seqs_FiveK.py:39), so an identity `test` is faithful for
    every reachable code path.
    """
    pyutils = types.ModuleType("pyutils")
    edgeconnect = types.ModuleType("pyutils.edgeconnect")
    src = types.ModuleType("pyutils.edgeconnect.src")
    config_mod = types.ModuleType("pyutils.edgeconnect.src.config")
    ec_mod = types.ModuleType("pyutils.edgeconnect.src.edge_connect")

    class Config:
        def __init__(self, path):
            self._path = path

        def __getattr__(self, name):  # unknown keys -> None, like yaml dict
            return None

        def __setattr__(self, name, value):
            object.__setattr__(self, name, value)

    class EdgeConnect:
        def __init__(self, config):
            self.config = config

        def load(self):
            pass

        def test(self, img, mask):
            return img

    config_mod.Config = Config
    ec_mod.EdgeConnect = EdgeConnect
    pyutils.edgeconnect = edgeconnect
    edgeconnect.src = src
    src.config = config_mod
    src.edge_connect = ec_mod
    return {
        "pyutils": pyutils,
        "pyutils.edgeconnect": edgeconnect,
        "pyutils.edgeconnect.src": src,
        "pyutils.edgeconnect.src.config": config_mod,
        "pyutils.edgeconnect.src.edge_connect": ec_mod,
    }


def install_reference_shims():
    """Register kornia + pyutils.edgeconnect shims and create the dummy
    files InpaintOperator.__init__ expects relative to CWD
    (models/operators.py:631-635). Returns the tempdir to chdir into."""
    sys.modules.setdefault("kornia", _make_kornia_shim())
    for name, mod in _make_edgeconnect_shim().items():
        sys.modules.setdefault(name, mod)

    tmp = tempfile.mkdtemp(prefix="t2onet_parity_")
    ec_dir = os.path.join(tmp, "pyutils", "edgeconnect")
    os.makedirs(os.path.join(ec_dir, "checkpoints", "places2"), exist_ok=True)
    with open(os.path.join(ec_dir, "config.yml.example"), "w") as f:
        f.write("MODE: 2\n")
    return tmp


# ---------------------------------------------------------------------------
# build both actors on identical weights
# ---------------------------------------------------------------------------

def build_reference_actor(ref_dir: str, checkpoint: str = None):
    if ref_dir not in sys.path:
        sys.path.insert(0, ref_dir)
    tmp = install_reference_shims()
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        import torch
        from options.seq2seqGAN_train_options import TrainOptions  # type: ignore

        to = TrainOptions()
        opt = to.parser.parse_args([])  # defaults, skip parse() side effects
        opt.gpu_ids = []
        opt.dataset = "FiveK"
        opt.session = 1
        opt.vocab_dir = os.path.join(ref_dir, "data", "language")
        torch.manual_seed(7)

        from models.actor import Actor as RefActor  # type: ignore

        ref_actor = RefActor(opt)
        if checkpoint:
            sd = torch.load(checkpoint, map_location="cpu")
            ref_actor.load_state_dict(sd, strict=False)
        ref_actor.eval()
        return ref_actor, opt
    finally:
        os.chdir(cwd)


def build_tpu_actor(ref_actor, opt):
    from t2onet_tpu.config import ModelConfig, OperatorConfig
    from t2onet_tpu.convert.torch_checkpoint import convert_state_dict
    from t2onet_tpu.models.actor import Actor

    params, stats = convert_state_dict(ref_actor.state_dict())
    cfg = ModelConfig(
        encoder_max_len=opt.encoder_max_len,
        decoder_max_len=opt.decoder_max_len,
        hidden_size=opt.hidden_size,
        word_vec_dim=opt.word_vec_dim,
        n_layers=opt.n_layers,
        operator_fc_dim=opt.operator_fc_dim,
        # reproduce the reference's unmasked batched attention exactly
        attend_batch_max=True,
    )
    actor = Actor(cfg=cfg, opcfg=OperatorConfig(),
                  vocab_size=len(ref_actor.vocab2id),
                  explore_prob=opt.explore_prob)
    return actor, {"params": params, "batch_stats": stats}


def real_requests(ref_dir: str, batch: int, max_len: int):
    """request_idx rows from the reference's real FiveK annotations."""
    path = os.path.join(ref_dir, "data", "FiveK", "annotations",
                        "train_sess_1.json")
    with open(path) as f:
        anns = json.load(f)
    rows = [a["request_idx"] for a in anns[:batch]]
    x = np.zeros((batch, max_len), np.int64)
    for i, r in enumerate(rows):
        r = np.asarray(r, np.int64)[:max_len]
        x[i, :len(r)] = r
    return x, [anns[i]["request"] for i in range(batch)]


# ---------------------------------------------------------------------------
# the comparison
# ---------------------------------------------------------------------------

def run_parity(ref_dir: str = "/root/reference", checkpoint: str = None,
               batch: int = 4, img_size: int = 48, tol: float = 1e-3,
               verbose: bool = True, platform: str = "cpu"):
    """Returns dict of metrics; raises AssertionError on divergence."""
    import torch

    import jax

    if platform:
        # Pin the backend BEFORE any client exists (this machine's
        # sitecustomize pins a remote single-chip TPU whose per-dispatch
        # tunnel latency makes a CPU-sized comparison crawl).
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass
    import jax.numpy as jnp

    ref_actor, opt = build_reference_actor(ref_dir, checkpoint)
    actor, variables = build_tpu_actor(ref_actor, opt)

    rng = np.random.default_rng(3)
    img = rng.uniform(0.15, 0.85, size=(batch, 3, img_size, img_size)
                      ).astype(np.float32)
    x, reqs = real_requests(ref_dir, batch, opt.encoder_max_len)

    # reference rollout (greedy)
    with torch.no_grad():
        _, ref_imgs, ref_ops, _ = ref_actor.episode_forward(
            torch.from_numpy(x), torch.from_numpy(img), None,
            reinforce_sample=0)
    ref_imgs = ref_imgs.numpy()                      # (B, S, 3, H, W)
    ref_ops = ref_ops.numpy()                        # (B, S)

    # t2onet_tpu rollout (greedy) — force full f32 matmuls so the
    # comparison isn't polluted by reduced-precision defaults
    with jax.default_matmul_precision("highest"):
        out = jax.jit(
            lambda v, x_, i_: actor.apply(v, x_, i_, sample=False,
                                          train=False, method=actor.episode)
        )(variables, jnp.asarray(x, jnp.int32), jnp.asarray(img))
    tpu_imgs = np.asarray(out["imgs"])
    tpu_ops = np.asarray(out["ops"])

    ops_match = bool((ref_ops == tpu_ops).all())
    img_l1_max = float(np.abs(ref_imgs - tpu_imgs).max())
    img_l1_mean = float(np.abs(ref_imgs - tpu_imgs).mean())

    if verbose:
        print(f"[parity] requests: {reqs}")
        print(f"[parity] ref ops:\n{ref_ops}\n[parity] tpu ops:\n{tpu_ops}")
        print(f"[parity] ops identical: {ops_match}")
        print(f"[parity] per-step image L1: max={img_l1_max:.2e} "
              f"mean={img_l1_mean:.2e} (tol {tol})")

    assert ops_match, (ref_ops, tpu_ops)
    assert img_l1_max <= tol, f"image L1 {img_l1_max} > {tol}"
    return {"ops_match": ops_match, "img_l1_max": img_l1_max,
            "img_l1_mean": img_l1_mean, "n_steps": int(ref_ops.shape[1]),
            "batch": batch}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--img_size", type=int, default=48)
    p.add_argument("--tol", type=float, default=1e-3)
    a = p.parse_args()
    m = run_parity(a.reference, a.checkpoint, a.batch, a.img_size, a.tol)
    print(f"[parity] PASS: {m}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
