"""Planner driver: generate pseudo-gt action sequences for FiveK.

Spec: reference preprocess/gen_greedy_seqs_FiveK.py (beam 3, ops
[0,1,2,3,5,6], err 1e-2, L1) — with the on-device vmapped fitter instead
of scipy Nelder-Mead.

  python -m t2onet_tpu.cli.plan_fivek --synthetic --limit 8 \
      --out_dir output/actions_set_1 --phase train
"""

from __future__ import annotations

import argparse


from t2onet_tpu.cli import common
from t2onet_tpu.planner.generate import plan_dataset


def main(argv=None):
    p = argparse.ArgumentParser()
    common.add_base_args(p)
    p.add_argument("--out_dir", default="output/actions_set_1")
    p.add_argument("--phase", default="train")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--start", type=int, default=0,
                   help="first pair index (for multi-host sharding)")
    p.add_argument("--beam_size", type=int, default=3)
    p.add_argument("--err", type=float, default=1e-2)
    p.add_argument("--mode", default="plain",
                   choices=["plain", "eps", "fixed"])
    p.add_argument("--n_starts", type=int, default=2)
    p.add_argument("--n_iters", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--pair_batch", type=int, default=1,
                   help=">1: lockstep-batch pairs into one device fit")
    a = p.parse_args(argv)
    common.maybe_force_cpu(a)

    if a.synthetic:
        ds, vocab2id, _, _ = common.build_dataset_and_vocab(a, a.phase)

        def pairs():
            for i in range(a.start, len(ds)):
                img, imgs, _, _, _, req = ds.make_item(i)
                yield img[None], imgs[-1][None], req
    else:
        # planning happens BEFORE actions exist: use the plain pair loader
        # (the Act dataset would try to read the planner output)
        import os

        from t2onet_tpu.data.fivek import FiveK

        ds = FiveK(os.path.join(a.data_dir, "FiveK", "images"),
                   os.path.join(a.data_dir, "FiveK", "annotations"),
                   a.phase, a.session, a.img_size)

        def pairs():
            for i in range(a.start, len(ds)):
                img_x, img_y, _, req = ds[i]
                yield img_x[None], img_y[None], req

    kw = dict(beam_size=a.beam_size, err=a.err, mode=a.mode,
              n_starts=a.n_starts, n_iters=a.n_iters, lr=a.lr)
    if a.pair_batch > 1:
        from t2onet_tpu.planner.generate import plan_dataset_batched

        plan_dataset_batched(pairs(), a.out_dir, phase=a.phase,
                             pair_batch=a.pair_batch, limit=a.limit,
                             start_index=a.start, **kw)
    else:
        plan_dataset(pairs(), a.out_dir, phase=a.phase, limit=a.limit,
                     start_index=a.start, **kw)


if __name__ == "__main__":
    main()
