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

def build_reference_actor(ref_dir: str, checkpoint: str = None,
                          train_mode: bool = False,
                          zero_dropout: bool = False):
    """train_mode=True leaves the module in .train() (BatchNorm on batch
    statistics — the trainer's regime); zero_dropout=True zeroes the
    encoder/decoder dropout options BEFORE construction so a train-mode
    forward is deterministic (the loss-parity comparison needs both)."""
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
        if zero_dropout:
            opt.input_dropout_p = 0.0
            opt.dropout_p = 0.0
        torch.manual_seed(7)

        from models.actor import Actor as RefActor  # type: ignore

        ref_actor = RefActor(opt)
        if checkpoint:
            sd = torch.load(checkpoint, map_location="cpu")
            ref_actor.load_state_dict(sd, strict=False)
        ref_actor.train() if train_mode else ref_actor.eval()
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
        # reference default: GloVe rows frozen, special rows trainable
        # (seq2seqGAN_train_options.py:39) — matters for gradient parity
        fix_input_embedding=bool(opt.fix_input_embedding),
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


# ---------------------------------------------------------------------------
# supervised-phase (teacher-forced) loss + gradient parity
# ---------------------------------------------------------------------------

def make_supervised_batch(ref_dir: str, opt, batch: int, img_size: int,
                          seed: int = 11):
    """A teacher-forced training batch with varied sequence lengths.

    y rows are [START, op*, END, NONE...] over the FiveK-planned op vocab
    ids (brightness/contrast/saturation/hue/tint/sharpness = 3,4,5,6,8,9);
    gt_params carry values in each op's real parameter slots (color 24 /
    tone 8 / scalars 1) so the MSE/nnz normalization is exercised exactly
    as in the reference trainer (train_seq2seqL1.py:60)."""
    rng = np.random.default_rng(seed)
    x, reqs = real_requests(ref_dir, batch, opt.encoder_max_len)
    T = opt.decoder_max_len + 2                      # max_y
    param_counts = {3: 1, 4: 1, 5: 1, 6: 24, 8: 8, 9: 1}
    op_pool = list(param_counts)
    y = np.zeros((batch, T), np.int64)
    gt_params = np.zeros((batch, T - 2, 24), np.float32)
    for i in range(batch):
        k = int(rng.integers(1, T - 2))              # 1..decoder_max_len-1
        if i == 0:
            k = T - 2                                # one full-length row
        ops = rng.choice(op_pool, size=k, replace=False)
        y[i, 0] = 1
        y[i, 1:1 + k] = ops
        y[i, 1 + k] = 2
        for s, op in enumerate(ops):
            n = param_counts[int(op)]
            gt_params[i, s, :n] = rng.uniform(-0.3, 0.3, n)
    img_x = rng.uniform(0.1, 0.9, (batch, 3, img_size, img_size)
                        ).astype(np.float32)
    img_y = rng.uniform(0.1, 0.9, (batch, T - 1, 3, img_size, img_size)
                        ).astype(np.float32)
    return x, y, img_x, img_y, gt_params, reqs


def _grad_state_dict(ref_actor):
    """{state_dict key: grad or zeros} — buffers (BN running stats etc.)
    get zeros so convert_state_dict's mappings apply unchanged. Every
    transform the converter performs is linear re-indexing (transpose,
    gate split, bias_ih+bias_hh sum), so it maps gradients exactly as it
    maps weights (the summed-bias leaf comes out at 2x, which per-leaf
    cosine is invariant to)."""
    import torch

    grads = {}
    named_params = dict(ref_actor.named_parameters())
    for k, v in ref_actor.state_dict().items():
        p = named_params.get(k)
        if p is not None and p.grad is not None:
            grads[k] = p.grad.detach().clone()
        else:
            grads[k] = torch.zeros_like(v, dtype=torch.float32) \
                if v.is_floating_point() else torch.zeros(v.shape)
    return grads


def _tree_cosines(tree_a, tree_b, zero_tol: float = 1e-7):
    """{path: cosine} over leaves where either side has meaningful norm.

    Leaves where BOTH norms are < zero_tol are skipped: those are
    structurally-zero gradients holding f32 noise (e.g. the vis-encoder
    fc bias, which feeds straight into BatchNorm1d — BN subtracts the
    mean, so the bias has exactly zero effect), where a cosine is
    meaningless. A leaf that is zero on one side but real on the other
    still yields cosine ~0 and fails the check, as it should."""
    import jax

    flat_a = jax.tree_util.tree_flatten_with_path(tree_a)[0]
    flat_b = jax.tree_util.tree_leaves(tree_b)
    out = {}
    for (path, a), b in zip(flat_a, flat_b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na < zero_tol and nb < zero_tol:
            continue
        out[jax.tree_util.keystr(path)] = float(
            a @ b / max(na * nb, 1e-12))
    return out


def run_supervised_parity(ref_dir: str = "/root/reference",
                          checkpoint: str = None, batch: int = 4,
                          img_size: int = 48, tol: float = 1e-4,
                          grad_cos_min: float = 0.999,
                          verbose: bool = True, platform: str = "cpu"):
    """Whole-vs-whole supervised-phase parity (VERDICT r2 item 4).

    Runs the reference trainer's exact supervised iteration (teacher-
    forced forward + op NLL over positions 1..step-1 + param MSE/nnz,
    reference experiments/t2onet/train_seq2seqL1.py:51-61) and ours
    (Actor.supervised with per_step_bn + train.loop.supervised_losses) on
    identical converted weights and an identical batch, both in train
    mode (BatchNorm on batch statistics, dropout zeroed), and asserts

    - op_loss and param_loss agree within ``tol``, and
    - the full parameter-gradient trees agree: per-leaf cosine >=
      ``grad_cos_min`` (torch grads mapped through convert_state_dict).

    Returns the metrics dict; raises AssertionError on divergence.
    """
    import torch

    import jax

    if platform:
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass
    import jax.numpy as jnp

    ref_actor, opt = build_reference_actor(
        ref_dir, checkpoint, train_mode=True, zero_dropout=True)
    actor, variables = build_tpu_actor(ref_actor, opt)
    x, y, img_x, img_y, gt_params, _ = make_supervised_batch(
        ref_dir, opt, batch, img_size)

    # ---- reference supervised iteration (train_seq2seqL1.py:51-61) ----
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    ixt, iyt = torch.from_numpy(img_x), torch.from_numpy(img_y)
    gpt = torch.from_numpy(gt_params)
    step = int((yt != 0).sum(1).max().item())
    _, ref_pred_params, ref_logprobs = ref_actor.supervised_forward(
        xt, yt, ixt, iyt, gpt, mask=None)
    n_cls = ref_logprobs.shape[-1]
    target = yt[:, 1:step].contiguous().view(-1)
    ref_op_loss = torch.nn.NLLLoss()(ref_logprobs.view(-1, n_cls), target)
    nnz = (gpt[:, : step - 2] != 0).sum()
    ref_param_loss = torch.nn.MSELoss(reduction="sum")(
        ref_pred_params, gpt[:, : step - 2]) / nnz
    ref_loss = ref_op_loss + ref_param_loss
    ref_actor.zero_grad()
    ref_loss.backward()
    ref_op_loss = ref_op_loss.detach()
    ref_param_loss = ref_param_loss.detach()
    from t2onet_tpu.convert.torch_checkpoint import convert_state_dict

    ref_grads, _ = convert_state_dict(_grad_state_dict(ref_actor))

    # ---- ours: same weights, same batch, same loss protocol ----
    from t2onet_tpu.models.actor import Actor
    from t2onet_tpu.train.loop import supervised_losses

    xj = jnp.asarray(x, jnp.int32)
    yj = jnp.asarray(y, jnp.int32)

    def loss_fn(params):
        out, _upd = actor.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xj, yj, jnp.asarray(img_x), jnp.asarray(img_y),
            train=True, per_step_bn=True, mutable=["batch_stats"],
            method=Actor.supervised)
        op_loss, param_loss = supervised_losses(
            out[2], out[1], yj, jnp.asarray(gt_params))
        return op_loss + param_loss, (op_loss, param_loss)

    with jax.default_matmul_precision("highest"):
        (_, (op_loss, param_loss)), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])

    d_op = abs(float(op_loss) - float(ref_op_loss))
    d_param = abs(float(param_loss) - float(ref_param_loss))
    cosines = _tree_cosines(ref_grads, grads)
    worst = min(cosines, key=cosines.get)
    m = {"op_loss_ref": float(ref_op_loss), "op_loss_tpu": float(op_loss),
         "param_loss_ref": float(ref_param_loss),
         "param_loss_tpu": float(param_loss),
         "op_loss_delta": d_op, "param_loss_delta": d_param,
         "grad_cos_min": cosines[worst], "grad_cos_min_leaf": worst,
         "grad_leaves_compared": len(cosines), "step": step,
         "batch": batch}
    if verbose:
        print(f"[parity/supervised] op_loss ref {m['op_loss_ref']:.6f} vs "
              f"tpu {m['op_loss_tpu']:.6f} (delta {d_op:.2e}); param_loss "
              f"ref {m['param_loss_ref']:.6f} vs tpu "
              f"{m['param_loss_tpu']:.6f} (delta {d_param:.2e})")
        print(f"[parity/supervised] grad cosine over "
              f"{len(cosines)} leaves: min {cosines[worst]:.6f} at {worst}")
    assert d_op <= tol, f"op_loss delta {d_op} > {tol}"
    assert d_param <= tol, f"param_loss delta {d_param} > {tol}"
    assert cosines[worst] >= grad_cos_min, (worst, cosines[worst])
    return m


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--img_size", type=int, default=48)
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--supervised", action="store_true",
                   help="also run the supervised loss/grad parity check")
    a = p.parse_args()
    m = run_parity(a.reference, a.checkpoint, a.batch, a.img_size, a.tol)
    print(f"[parity] PASS: {m}")
    if a.supervised:
        ms = run_supervised_parity(a.reference, a.checkpoint, a.batch,
                                   a.img_size)
        print(f"[parity/supervised] PASS: {ms}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
