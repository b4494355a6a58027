"""Train the first-party inpainting backend (the inpaint operator slot).

The reference ships no inpainting trainer at all — its InpaintOperator
calls an external pretrained EdgeConnect checkpoint (reference:
models/operators.py:625-682, submodule not vendored). This trainer makes
the slot self-contained: self-supervised reconstruction of images through
random free-form holes.

  python -m t2onet_tpu.cli.train_inpaint --synthetic --num_iters 500 \
      --batch_size 8 --img_size 64
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from t2onet_tpu.cli import common


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    common.add_base_args(p)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_iters", type=int, default=2000)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--print_every", type=int, default=50)
    p.add_argument("--checkpoint_every", type=int, default=500)
    p.add_argument("--features", type=int, default=32)
    return p


def main(argv=None):
    a = build_parser().parse_args(argv)
    common.maybe_force_cpu(a)

    import jax
    import jax.numpy as jnp
    import optax

    from t2onet_tpu.models.inpaint import (
        InpaintNet, compose, inpaint_loss, make_train_step,
        random_freeform_masks, save_inpaint)

    run_dir = common.resolve_run_dir(a)
    ckpt_dir = os.path.join(run_dir, "inpaint_model")
    logger = common.ScalarLogger(run_dir, name="inpaint")

    ds, _, _, _ = common.build_dataset_and_vocab(a, phase="train")
    rng = np.random.default_rng(a.manual_seed)

    net = InpaintNet(features=a.features)
    key = jax.random.PRNGKey(a.manual_seed)
    img0 = jnp.zeros((a.batch_size, 3, a.img_size, a.img_size))
    m0 = jnp.zeros((a.batch_size, 1, a.img_size, a.img_size))
    params = net.init(key, img0, m0)
    tx = optax.adam(a.learning_rate)
    opt_state = tx.init(params)
    step = make_train_step(net, tx)

    batches = ds.batches(batch_size=a.batch_size, steps=a.num_iters,
                         shuffle=True)
    t0, avg = time.time(), None
    for itr, b in enumerate(batches, start=1):
        img = jnp.asarray(b["img_x"])
        mask = jnp.asarray(random_freeform_masks(
            rng, img.shape[0], img.shape[2], img.shape[3]))
        params, opt_state, loss = step(params, opt_state, img, mask)
        loss = float(loss)
        avg = loss if avg is None else 0.95 * avg + 0.05 * loss
        if itr % a.print_every == 0:
            dt = (time.time() - t0) / itr
            print(f"iter {itr}/{a.num_iters} loss {avg:.4f} "
                  f"({dt * 1e3:.0f} ms/it)", flush=True)
            logger.log(itr, inpaint_loss=avg)
        if itr % a.checkpoint_every == 0 or itr == a.num_iters:
            save_inpaint(ckpt_dir, net, params)

    # quality record: hole-region L1 + PSNR on HELD-OUT images (val
    # split; fresh masks), vs the blank-fill baseline. PSNR over the
    # composited image (known region exact), which is how the filler is
    # consumed by the planner's inpaint slot.
    try:
        eval_ds, _, _, _ = common.build_dataset_and_vocab(a, phase="val")
    except (FileNotFoundError, KeyError):
        eval_ds = ds                      # synthetic/tiny workspaces
    n_eval, tot = 4, {"l1_b": 0.0, "l1_a": 0.0, "mse_b": 0.0, "mse_a": 0.0}
    for _ in range(n_eval):
        b = next(eval_ds.batches(batch_size=a.batch_size, steps=1,
                                 shuffle=True))
        img = jnp.asarray(b["img_x"])
        mask = jnp.asarray(random_freeform_masks(
            rng, img.shape[0], img.shape[2], img.shape[3]))
        pred = compose(net.apply(params, img, mask), img, mask)
        holed = img * (1.0 - mask)
        denom = mask.sum() * 3 + 1e-8
        tot["l1_b"] += float((jnp.abs(holed - img) * mask).sum() / denom)
        tot["l1_a"] += float((jnp.abs(pred - img) * mask).sum() / denom)
        tot["mse_b"] += float((jnp.square(holed - img) * mask).sum() / denom)
        tot["mse_a"] += float((jnp.square(pred - img) * mask).sum() / denom)
    l1_b, l1_a = tot["l1_b"] / n_eval, tot["l1_a"] / n_eval
    psnr_b = 10 * np.log10(1.0 / max(tot["mse_b"] / n_eval, 1e-10))
    psnr_a = 10 * np.log10(1.0 / max(tot["mse_a"] / n_eval, 1e-10))
    print(f"hole L1: {l1_b:.4f} (blanked) -> {l1_a:.4f} (filled)  "
          f"hole PSNR: {psnr_b:.2f} dB -> {psnr_a:.2f} dB  "
          f"({n_eval}x{a.batch_size} held-out images)")
    logger.log(a.num_iters, hole_l1=l1_a, hole_psnr=psnr_a,
               hole_l1_blank=l1_b, hole_psnr_blank=psnr_b)
    print(f"saved {ckpt_dir}")


if __name__ == "__main__":
    main()
