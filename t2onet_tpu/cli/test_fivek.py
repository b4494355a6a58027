"""FiveK evaluation: greedy rollout, L1/SSIM(/FID), variance probe, gallery.

Protocol spec: reference experiments/t2onet/test_seq2seqL1.py — greedy
episode per sample, image at first <END>, ImageEvaluator metrics, the
`test_variance` probe over 10 canonical requests, and an HTML gallery with
attention heatmaps.

Usage (synthetic):
  python -m t2onet_tpu.cli.test_fivek --synthetic --img_size 64 \
      --run_dir output/FiveK_trial_1
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from t2onet_tpu.cli import common
from t2onet_tpu.data.text import txt2idx
from t2onet_tpu.evals.html import HTML
from t2onet_tpu.evals.metrics import TEST_TXTS, ImageEvaluator
from t2onet_tpu.evals.visualize import update_web_row
from t2onet_tpu.train.checkpoint import CheckpointManager
from t2onet_tpu.train.loop import create_train_state, make_eval_episode


def _features_fn(a):
    """FID extractor when weights are supplied (reference eval protocol
    defaults to the patched fid_inception, utils/FID/inception.py:36,79);
    None disables FID exactly like the reference run without the .pth."""
    ckpt = getattr(a, "fid_inception_ckpt", None)
    if not ckpt:
        return None
    from t2onet_tpu.evals.inception import load_fid_inception

    return load_fid_inception(ckpt,
                              fid_variant=bool(getattr(a, "fid_variant", 1)))


def test_native_res(actor, state, ds, a, id2op, run_dir="output/test",
                    visualize: bool = False, quantum: int = 64) -> dict:
    """Per-sample eval at native aspect ratio (reference protocol:
    short-side-600 variable shapes, test_seq2seqL1.py bs=1 loop): each
    image is edge-padded to a 64-px bucket for the jitted rollout (a
    handful of compiles total), outputs cropped back, metrics computed on
    the host at the true resolution."""
    from t2onet_tpu.evals.bucketing import crop_valid, fit_within, pad_to_bucket

    eval_fn = make_eval_episode(actor)
    evaluator = ImageEvaluator(host_metrics=True, features_fn=_features_fn(a))
    webpage = None
    if visualize:
        webpage = HTML(os.path.join(run_dir, "test", "web"),
                       f"inference result trial {a.trial}")
    for i in range(len(ds)):
        item = ds[i]
        if isinstance(item, dict):          # GIERDataset items
            img_x, img_y = item["input"], item["output"]
            req_idx = np.asarray(item["request_idx"])
            req = item["request"]
        else:                               # FiveK tuples
            img_x, img_y, req_idx, req = item
        if max(img_x.shape[1:]) > 1024:
            # extreme aspect ratios (short side 600 -> long side > 1024):
            # downscale the whole pair rather than silently cropping —
            # metrics then cover every pixel, at slightly reduced scale
            img_x = fit_within(img_x, 1024)
            img_y = fit_within(img_y, 1024)
        padded, valid_hw = pad_to_bucket(img_x, quantum)
        x = jnp.asarray(req_idx.astype(np.int32))[None]
        pred, out = eval_fn(state, {"x": x, "img_x": jnp.asarray(padded)[None]})
        pred_c = np.asarray(crop_valid(pred, valid_hw))[0]
        h, w = valid_hw
        evaluator.update(img_x[None, :, :h, :w], pred_c[None],
                         img_y[None, :, :h, :w])
        if (i + 1) % 64 == 0:
            print(f"eval {i + 1}/{len(ds)} pairs", flush=True)
        if webpage is not None and i % 25 == 0:
            update_web_row(webpage, i, req, img_x,
                           np.asarray(crop_valid(out["imgs"][0], valid_hw)),
                           np.asarray(out["ops"][0]),
                           np.asarray(out["params"][0]), id2op,
                           gt_img=img_y,
                           attn=None if out["attn"] is None
                           else np.asarray(out["attn"][0]))
    if webpage is not None:
        webpage.save()
    return evaluator.eval()


def test(actor, state, ds, a, id2op, visualize: bool = False,
         run_dir: str = "output/test") -> dict:
    eval_fn = make_eval_episode(actor)
    evaluator = ImageEvaluator(features_fn=_features_fn(a))
    webpage = None
    if visualize:
        webpage = HTML(os.path.join(run_dir, "test", "web"),
                       f"inference result trial {a.trial}")
        webpage.add_header(f"Visualization of result for trial {a.trial}")

    # sequential covers EVERY item (the reference's per-item protocol);
    # the short tail batch costs one extra eval compile
    sample_id = 0
    for batch in ds.batches(16, 0, shuffle=False, sequential=True):
        b = {"x": jnp.asarray(batch["x"]), "img_x": jnp.asarray(batch["img_x"])}
        pred, out = eval_fn(state, b)
        gt = jnp.asarray(batch["img_y"][:, -1])
        for i in range(pred.shape[0]):
            evaluator.update(b["img_x"][i:i + 1], pred[i:i + 1],
                             gt[i:i + 1])
            if webpage is not None and sample_id % 10 == 0:
                update_web_row(
                    webpage, sample_id, batch["req"][i],
                    np.asarray(b["img_x"][i]), np.asarray(out["imgs"][i]),
                    np.asarray(out["ops"][i]), np.asarray(out["params"][i]),
                    id2op, gt_img=np.asarray(gt[i]),
                    attn=None if out["attn"] is None
                    else np.asarray(out["attn"][i]))
            sample_id += 1
    if webpage is not None:
        webpage.save()
    return evaluator.eval()


def test_variance(actor, state, ds, a, vocab2id, n_images: int = 16) -> float:
    """Sensitivity of outputs to the 10 canonical requests
    (reference test_seq2seqL1.py:99-142)."""
    eval_fn = make_eval_episode(actor)
    reqs = np.concatenate(
        [txt2idx(t, vocab2id, a.encoder_max_len) for t in TEST_TXTS], 0)
    avg_var, n = 0.0, 0
    for batch in ds.batches(1, n_images, shuffle=False):
        img = jnp.asarray(batch["img_x"])
        imgs = jnp.repeat(img, len(TEST_TXTS), axis=0)
        pred, _ = eval_fn(state, {"x": jnp.asarray(reqs.astype(np.int32)),
                                  "img_x": imgs})
        n += 1
        avg_var += (float(jnp.var(pred, axis=0).mean()) - avg_var) / n
    print(f"avg var: {avg_var:.6f}")
    return avg_var


def main(argv=None):
    p = argparse.ArgumentParser()
    common.add_base_args(p)
    p.add_argument("--visualize", type=int, default=0)
    p.add_argument("--checkpoint", default="best")
    p.add_argument("--ckpt_name", default="seq2seqL1_model",
                   help="checkpoint subdir: seq2seqL1_model, or "
                        "seq2seqGAN_model to evaluate a train_gan actor "
                        "(reference test_seq2seqGAN.py role)")
    p.add_argument("--skip_variance", action="store_true")
    p.add_argument("--fid_inception_ckpt", default=None,
                   help=".pth of InceptionV3 weights to enable FID "
                        "(pt_inception-2015-12-05 or torchvision)")
    p.add_argument("--fid_variant", type=int, default=1,
                   help="1 = pytorch-fid patched architecture (the "
                        "reference's use_fid_inception=True default), "
                        "0 = plain torchvision")
    a = p.parse_args(argv)
    common.maybe_force_cpu(a)
    run_dir = common.resolve_run_dir(a, record=False)

    ds, vocab2id, id2op, w2v = common.build_dataset_and_vocab(a, "test")
    actor, cfg = common.build_actor(a, len(vocab2id), w2v)
    # state init needs only array SHAPES — fixed synthetic-like dummies
    # (real test sets hold variable-shape native-res images that can't
    # batch; the actual eval shapes come from the bucketed rollout)
    state = create_train_state(
        actor, jax.random.PRNGKey(a.manual_seed),
        jnp.zeros((2, a.encoder_max_len), jnp.int32),
        jnp.zeros((2, 3, a.img_size, a.img_size)))
    ckpt_dir = os.path.join(run_dir, a.ckpt_name)
    if os.path.exists(os.path.join(ckpt_dir, "checkpoint_best")) or \
            a.checkpoint not in ("best", "latest"):
        state = CheckpointManager(ckpt_dir).restore(state, a.checkpoint)
        print(f"loaded checkpoint ({a.checkpoint}) from {ckpt_dir}")
    else:
        print("WARNING: no checkpoint found — evaluating random init")

    if a.synthetic:
        res = test(actor, state, ds, a, id2op, visualize=bool(a.visualize),
                   run_dir=run_dir)
    else:
        # real data: variable native resolutions (short-side-600)
        res = test_native_res(actor, state, ds, a, id2op, run_dir=run_dir,
                              visualize=bool(a.visualize))
    if not a.skip_variance:
        res["variance"] = test_variance(actor, state, ds, a, vocab2id)
    print({k: round(float(v), 5) for k, v in res.items()})


if __name__ == "__main__":
    main()
