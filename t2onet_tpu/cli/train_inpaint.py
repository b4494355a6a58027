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

    # quick self-report: hole L1 before/after filling on a fresh batch
    b = next(ds.batches(batch_size=a.batch_size, steps=1, shuffle=True))
    img = jnp.asarray(b["img_x"])
    mask = jnp.asarray(random_freeform_masks(
        rng, img.shape[0], img.shape[2], img.shape[3]))
    pred = compose(net.apply(params, img, mask), img, mask)
    holed = img * (1.0 - mask)
    denom = mask.sum() * 3 + 1e-8
    l1_before = float((jnp.abs(holed - img) * mask).sum() / denom)
    l1_after = float((jnp.abs(pred - img) * mask).sum() / denom)
    print(f"hole L1: {l1_before:.4f} (blanked) -> {l1_after:.4f} (filled)")
    print(f"saved {ckpt_dir}")


if __name__ == "__main__":
    main()
