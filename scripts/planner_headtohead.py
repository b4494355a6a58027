"""Planner head-to-head: our on-device multi-start-Adam beam search vs the
reference's scipy-Nelder-Mead beam search, on IDENTICAL image pairs.

The reference plans pseudo-gt operation sequences with
`utils/beam_search.py:196-264`: per (beam, op) candidate it fits the op's
parameters with `scipy.optimize.minimize(..., 'Nelder-Mead')`
(beam_search.py:65-91), hundreds of full-image executor calls per fit.
This repo replaces that with ONE jitted device call per step that fits
all (beam x op x restart) candidates jointly (planner/fit.py). SURVEY §7
flagged matching Nelder-Mead's *solution quality* as a hard part that
needs validation — this script is that validation:

1. builds the reference Executor from its own options defaults (kornia /
   edgeconnect shims from parity_harness),
2. runs BOTH planners on the same pairs with the reference driver's
   settings (beam 3, ops [0,1,2,3,5,6], err 1e-2, L1 —
   preprocess/gen_greedy_seqs_FiveK.py:38-42),
3. reports per-pair final best-beam distances, op sequences, and s/pair,
   and asserts our final distance is never meaningfully worse
   (ours <= ref + tol per pair; aggregate mean must be <= ref's).

Pairs come from a staged workspace (--data_dir) or are synthesized with
the same generator scripts/prepare_real_fivek.py uses.

  python scripts/planner_headtohead.py --pairs 32 --img_size 64

Importable: tests/test_planner_headtohead.py wraps run_headtohead() on
tiny images as an automated smoke test.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from scripts.parity_harness import install_reference_shims  # noqa: E402

REF_OPERATIONS = [0, 1, 2, 3, 5, 6]   # gen_greedy_seqs_FiveK.py:39
REF_OP_NAMES = ["brightness", "contrast", "saturation", "color", "inpaint",
                "tone", "sharpness", "white"]


def build_reference_executor(ref_dir: str):
    """The reference Executor on its own option defaults (CPU torch)."""
    if ref_dir not in sys.path:
        sys.path.insert(0, ref_dir)
    tmp = install_reference_shims()
    cwd = os.getcwd()
    os.chdir(tmp)   # InpaintOperator reads config files relative to CWD
    try:
        from options.seq2seqGAN_train_options import TrainOptions  # type: ignore

        opt = TrainOptions().parser.parse_args([])
        opt.gpu_ids = []

        from executors.executor import Executor  # type: ignore

        return Executor(opt)
    finally:
        os.chdir(cwd)


def ref_plan_pair(executor, img_x: np.ndarray, img_y: np.ndarray,
                  beam_size=3, err=1e-2, max_step=None):
    """Run the reference beam_search (Nelder-Mead, L1) on one pair.

    img_x/img_y: (1, 3, H, W) float32 [0,1]. Returns (final_dist,
    op_names, seconds). final_dist = best beam's last-step distance
    (the 'dist' stored per action, beam_search.py:241), or the initial
    distance if the search accepted nothing.
    """
    import torch

    from utils.beam_search import beam_search as ref_beam_search  # type: ignore

    tx = torch.from_numpy(img_x)
    ty = torch.from_numpy(img_y)
    t0 = time.time()
    with torch.no_grad():
        actions, imgs = ref_beam_search(
            tx, ty, None, executor, None, beam_size, REF_OPERATIONS,
            REF_OP_NAMES, max_step or len(REF_OPERATIONS), err, "L1",
            "Nelder-Mead", replace=False)
    dt = time.time() - t0
    best = actions[0]
    if best:
        return float(best[-1][2]), [a[0] for a in best], dt, actions, imgs
    init = float((tx - ty).norm(1) / tx.numel())
    return init, [], dt, actions, imgs


def our_plan_pair(img_x: np.ndarray, img_y: np.ndarray, beam_size=3,
                  err=1e-2, max_step=None, n_starts=2, n_iters=100,
                  lr=0.05, seed=0):
    """Run our planner (planner/beam.py) with the same driver settings."""
    from t2onet_tpu.planner.beam import beam_search, init_distance

    t0 = time.time()
    actions, imgs = beam_search(
        img_x, img_y, beam_size=beam_size, operations=REF_OPERATIONS,
        max_step=max_step or len(REF_OPERATIONS), err=err, mode="plain",
        n_starts=n_starts, n_iters=n_iters, lr=lr, seed=seed,
        dist_type="l1")
    dt = time.time() - t0
    best = actions[0]
    if best:
        return float(best[-1][2]), [a[0] for a in best], dt, actions, imgs
    return init_distance(img_x, img_y), [], dt, actions, imgs


def make_pairs(n: int, img_size: int, data_dir: str = None, phase="train"):
    """(input, target, request) triples: a staged workspace if given, else
    the prepare_real_fivek synthetic generator (same edit family)."""
    out = []
    if data_dir:
        from t2onet_tpu.data.fivek import FiveK

        ds = FiveK(os.path.join(data_dir, "FiveK", "images"),
                   os.path.join(data_dir, "FiveK", "annotations"),
                   phase, 1, img_size, eval_img_mode="train_size")
        for i in range(min(n, len(ds))):
            img_x, img_y, _, req = ds[i]
            out.append((img_x[None].astype(np.float32),
                        img_y[None].astype(np.float32), req))
        return out
    from scripts.prepare_real_fivek import synth_input, synth_output

    for i in range(n):
        inp = synth_input(f"pair{i}_O.jpg", img_size).astype(np.float32)
        tgt = synth_output(inp, f"pair{i}_E.jpg").astype(np.float32)
        out.append((inp.transpose(2, 0, 1)[None],
                    tgt.transpose(2, 0, 1)[None], f"edit pair {i}"))
    return out


def _to_plain(actions):
    """Planner actions -> JSON-serializable [[op, [params...], dist]...]."""
    plain = []
    for seq in actions:
        pseq = []
        for (name, params, dist) in seq:
            arr = np.asarray(params, np.float64).ravel().tolist()
            pseq.append([name, arr, float(dist)])
        plain.append(pseq)
    return plain


def _save_item(save_dir, which, phase, i, req, ix, iy, actions, imgs):
    """Write one side's plan in the dataset layout (reference schema:
    {phase}{i}/{i:05d}.json + edit{k}.jpg of the top beam) so the
    head-to-head pairs double as training data for the downstream
    comparison (VERDICT r3 #6)."""
    from t2onet_tpu.evals.visualize import save_img
    from t2onet_tpu.planner.beam import init_distance

    item_dir = os.path.join(save_dir, which, f"{phase}{i}")
    os.makedirs(item_dir, exist_ok=True)
    top = imgs[0] if imgs else []
    for k, img in enumerate(top):
        save_img(np.asarray(img)[0], os.path.join(item_dir, f"edit{k}.jpg"))
    info = {"request": req,
            "init distance": float(init_distance(ix, iy)),
            "operation sequence": _to_plain(actions)}
    with open(os.path.join(item_dir, f"{i:05d}.json"), "w") as f:
        json.dump(info, f)


def run_headtohead(ref_dir: str = "/root/reference", pairs: int = 32,
                   img_size: int = 64, data_dir: str = None,
                   beam_size: int = 3, err: float = 1e-2,
                   max_step: int = None, n_iters: int = 100,
                   n_starts: int = 2, tol: float = 5e-3,
                   platform: str = "cpu", verbose: bool = True,
                   save_dir: str = None, log_every_row: str = None):
    """Returns aggregate metrics; raises AssertionError if our planner's
    solutions are meaningfully worse than Nelder-Mead's."""
    import jax

    if platform:
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass
    # persistent compile cache: beam-fit shapes vary per (step, beam,
    # remaining-op) configuration and each XLA compile is tens of seconds
    # on this host — without the cache the MEAN s/pair is dominated by
    # one-time compiles (r4 200-pair run: median 3.4 s, mean 72 s)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_t2onet"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    executor = build_reference_executor(ref_dir)
    data = make_pairs(pairs, img_size, data_dir)

    rows = []
    for i, (ix, iy, req) in enumerate(data):
        rd, rops, rt, racts, rimgs = ref_plan_pair(
            executor, ix, iy, beam_size, err, max_step)
        od, oops, ot, oacts, oimgs = our_plan_pair(
            ix, iy, beam_size, err, max_step, n_starts=n_starts,
            n_iters=n_iters, seed=i)
        if save_dir:
            _save_item(save_dir, "ref", "train", i, req, ix, iy, racts,
                       rimgs)
            _save_item(save_dir, "ours", "train", i, req, ix, iy, oacts,
                       oimgs)
        rows.append(dict(ref_dist=rd, our_dist=od, ref_ops=rops,
                         our_ops=oops, ref_s=rt, our_s=ot))
        if log_every_row:
            with open(log_every_row, "a") as f:
                f.write(json.dumps(rows[-1]) + "\n")
        if verbose:
            print(f"[planner] pair {i:3d}: ref {rd:.5f} ({rt:5.1f}s, "
                  f"{'-'.join(rops) or 'none'}) | ours {od:.5f} "
                  f"({ot:5.1f}s, {'-'.join(oops) or 'none'})", flush=True)

    ref_d = np.array([r["ref_dist"] for r in rows])
    our_d = np.array([r["our_dist"] for r in rows])
    m = {
        "pairs": len(rows),
        "img_size": img_size,
        "ref_dist_mean": float(ref_d.mean()),
        "our_dist_mean": float(our_d.mean()),
        "our_win_or_tie_frac": float((our_d <= ref_d + 1e-4).mean()),
        "max_regression": float((our_d - ref_d).max()),
        "ref_s_per_pair": float(np.mean([r["ref_s"] for r in rows])),
        # first pair carries jit compiles; steady-state is the honest rate
        "our_s_per_pair": float(np.mean([r["our_s"] for r in rows[1:]])
                                if len(rows) > 1 else rows[0]["our_s"]),
        "op_seq_match_frac": float(np.mean(
            [r["ref_ops"] == r["our_ops"] for r in rows])),
    }
    if verbose:
        print(f"[planner] {json.dumps(m, indent=2)}")
    assert (our_d <= ref_d + tol).all(), (
        f"our planner worse than Nelder-Mead by >{tol} on "
        f"{int((our_d > ref_d + tol).sum())} pairs "
        f"(max regression {m['max_regression']:.5f})")
    assert m["our_dist_mean"] <= m["ref_dist_mean"] + 1e-3, m
    return m


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--pairs", type=int, default=32)
    p.add_argument("--img_size", type=int, default=64)
    p.add_argument("--data_dir", default=None,
                   help="staged workspace (e.g. data_real); default: "
                        "synthesized pairs")
    p.add_argument("--beam_size", type=int, default=3)
    p.add_argument("--err", type=float, default=1e-2)
    p.add_argument("--max_step", type=int, default=None)
    p.add_argument("--n_iters", type=int, default=100)
    p.add_argument("--n_starts", type=int, default=2)
    p.add_argument("--tol", type=float, default=5e-3)
    p.add_argument("--platform", default="cpu")
    p.add_argument("--out_json", default=None)
    p.add_argument("--save_dir", default=None,
                   help="write both sides' plans in the dataset layout "
                        "({save_dir}/{ref,ours}/train{i}/...) for the "
                        "downstream training comparison")
    p.add_argument("--row_log", default=None,
                   help="append one JSON line per pair (crash-resumable "
                        "progress record)")
    a = p.parse_args()
    m = run_headtohead(a.reference, a.pairs, a.img_size, a.data_dir,
                       a.beam_size, a.err, a.max_step, a.n_iters,
                       a.n_starts, a.tol, a.platform, save_dir=a.save_dir,
                       log_every_row=a.row_log)
    if a.out_json:
        with open(a.out_json, "w") as f:
            json.dump(m, f, indent=2)
    print(f"[planner] PASS: ours {m['our_dist_mean']:.5f} <= "
          f"ref {m['ref_dist_mean']:.5f} mean final L1; "
          f"{m['ref_s_per_pair']:.2f} vs {m['our_s_per_pair']:.2f} s/pair")
    return 0


if __name__ == "__main__":
    sys.exit(main())
