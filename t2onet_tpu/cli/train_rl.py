"""RL fine-tuning trainer (REINFORCE + pathwise L1 + entropy penalty).

The reference ships RL machinery (Actor.forward single RL step, entropy
penalty, DDPG-era warmup/entropy flags) but not the RL training loop
itself (SURVEY.md §5.6). This trainer completes it: optional supervised
warmup (the reference's `warmup` flag lineage), then sampled episode
rollouts optimized with the losses in t2onet_tpu/train/rl.py.

  python -m t2onet_tpu.cli.train_rl --synthetic --warmup 200 \
      --num_iters 1000 --batch_size 16 --img_size 64
"""

from __future__ import annotations

import argparse
import os
import time

from t2onet_tpu.cli import common
from t2onet_tpu.cli.train_fivek import evaluate


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_base_args(p)
    common.add_train_args(p)
    p.add_argument("--warmup", type=int, default=200,
                   help="supervised warmup iterations before RL")
    # 0.01, not the reference flag's 0.05 (fiveK_train_options.py): at
    # 0.05 the uniform-pull on the op logits measurably overpowers the
    # REINFORCE signal during fine-tuning — per-step entropy penalty fell
    # 6.35 -> 0.72 over 300 RL iters while sampled-rollout L1 drifted
    # from 0.094 toward the identity edit's 0.16 (round-5 run record).
    p.add_argument("--entropy_factor", type=float, default=0.01)
    p.add_argument("--param_noise", type=float, default=0.0,
                   help="exploration noise on op params (reference "
                        "param_noise_factor 0.6; 0 = off)")
    p.add_argument("--pg_weight", type=float, default=0.1,
                   help="weight of the REINFORCE op-choice term against "
                        "the pathwise L1 (whose scale is ~0.05)")
    p.add_argument("--data_parallel", type=int, default=1)
    # ON-policy sampling: the REINFORCE estimator scores sampled ops
    # under the model's own log-probs, so the rollout must draw from the
    # model's softmax — the episode-L1 phase's explore-smoothed mixture
    # (default 0.05) measurably collapses the policy to <END> (train/rl.py
    # module docstring). Exploration comes from the softmax itself,
    # entropy regularization, and --param_noise.
    p.set_defaults(explore_prob=0.0)
    a = p.parse_args(argv)
    common.maybe_force_cpu(a)

    import jax
    import jax.numpy as jnp

    from t2onet_tpu.parallel.mesh import batch_sharding, make_mesh
    from t2onet_tpu.train.checkpoint import CheckpointManager
    from t2onet_tpu.train.loop import (create_train_state, make_eval_episode,
                                       make_supervised_step)
    from t2onet_tpu.train.rl import make_rl_step
    from t2onet_tpu.data.loader import Prefetcher, device_put_batch

    run_dir = common.resolve_run_dir(a)
    train_ds, vocab2id, _, w2v = common.build_dataset_and_vocab(a, "train")
    val_ds, _, _, _ = common.build_dataset_and_vocab(a, "val", eval_img_mode="train_size")
    actor, _ = common.build_actor(a, len(vocab2id), w2v)

    sample = next(train_ds.batches(a.batch_size, 1, shuffle=False))
    state = create_train_state(
        actor, jax.random.PRNGKey(a.manual_seed),
        jnp.asarray(sample["x"]), jnp.asarray(sample["img_x"]),
        learning_rate=a.learning_rate)

    mesh = None
    if a.data_parallel and len(jax.devices()) > 1:
        mesh = make_mesh()
        print(f"data-parallel over {len(mesh.devices.ravel())} devices")

    ckpt = CheckpointManager(os.path.join(run_dir, "seq2seqRL_model"),
                             max_to_keep=a.max_keep_ckpts or None)
    start_itr = 1
    if a.resume:
        # tolerate "no checkpoint yet": the supervisor appends --resume on
        # every relaunch, including after a crash before the first save
        try:
            state = ckpt.restore(state, "latest")
            start_itr = int(state.step) + 1
            print(f"resumed from iter {int(state.step)}")
        except FileNotFoundError:
            print("--resume: no checkpoint found, starting fresh")

    logger = common.ScalarLogger(run_dir, name="rl_metrics")
    sup_step = make_supervised_step(actor, mesh=mesh)
    rl_step = make_rl_step(actor, mesh=mesh, entropy_factor=a.entropy_factor,
                           param_noise=a.param_noise,
                           pg_weight=a.pg_weight)
    eval_fn = make_eval_episode(actor)

    sh = batch_sharding(mesh) if mesh is not None else None

    def stage(b):
        return device_put_batch({k: v for k, v in b.items() if k != "req"},
                                sh)

    rng = jax.random.PRNGKey(a.manual_seed + 1)
    if start_itr > 1:   # resumed: don't replay the pre-crash episode noise
        rng = jax.random.fold_in(rng, start_itr)
    total = a.warmup + a.num_iters
    n_left = max(total - start_itr + 1, 0)
    it = Prefetcher(train_ds.batches(a.batch_size, n_left, shuffle=True),
                    to_device=stage, depth=2)
    sums, counts, tik = {}, {}, time.time()
    try:
        for itr, jb in enumerate(it, start=start_itr):
            if itr <= a.warmup:
                state, m = sup_step(state, {k: jb[k] for k in
                                            ("x", "y", "img_x", "img_y",
                                             "gt_params")})
            else:
                rng, sub = jax.random.split(rng)
                state, m = rl_step(
                    state, {"x": jb["x"], "img_x": jb["img_x"],
                            "gt_img": jb["img_y"][:, -1]}, sub)
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + v
                counts[k] = counts.get(k, 0) + 1

            if itr % a.print_every == 0:
                avg = {k: float(sums[k]) / counts[k] for k in sums}
                sums, counts = {}, {}
                dt = (time.time() - tik) / a.print_every
                tik = time.time()
                phase = "warmup" if itr <= a.warmup else "rl"
                line = " ".join(f"{k} {v:.4f}" for k, v in sorted(avg.items()))
                print(f"iter {itr:6d}/{total} [{phase}] {line} "
                      f"{dt * 1e3:.0f} ms/it", flush=True)
                logger.log(itr, **avg)

            if itr % a.checkpoint_every == 0 or itr >= total:
                if a.val_batches > 0:
                    val = evaluate(actor, state, val_ds,
                                   min(a.batch_size, 16), a.val_batches,
                                   eval_fn)
                    best = ckpt.save(state, itr, val)
                    logger.log(itr, val_L1=val)
                    if best:
                        print(f"best model at iter {itr} "
                              f"(val L1 {val:.4f})")
                else:       # --val_batches 0: checkpoint without validating
                    ckpt.save(state, itr, None)
            if itr >= total:
                break
    finally:
        it.close()
    print("training done")


if __name__ == "__main__":
    main()
