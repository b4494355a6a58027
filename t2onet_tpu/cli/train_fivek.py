"""FiveK trainer: alternating supervised / end-to-end-L1 iterations.

Protocol spec: reference experiments/t2onet/train_seq2seqL1.py — odd iters
teacher-forced (op NLL + param MSE), even iters free rollout with L1 to gt,
one Adam over everything, periodic validation + best-checkpoint tracking.

Usage (synthetic, no image files needed):
  python -m t2onet_tpu.cli.train_fivek --synthetic --num_iters 200 \
      --batch_size 16 --img_size 64
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from t2onet_tpu.cli import common
from t2onet_tpu.parallel.mesh import make_mesh
from t2onet_tpu.train.checkpoint import CheckpointManager
from t2onet_tpu.train.loop import (
    create_train_state,
    make_episode_step,
    make_eval_episode,
    make_supervised_step,
)


def evaluate(actor, state, val_ds, batch_size: int, n_batches: int,
             eval_fn) -> float:
    dists, init_dists = [], []
    for batch in val_ds.batches(batch_size, n_batches, shuffle=False):
        b = {"x": jnp.asarray(batch["x"]), "img_x": jnp.asarray(batch["img_x"])}
        pred, _ = eval_fn(state, b)
        gt = jnp.asarray(batch["img_y"][:, -1])
        dists.append(float(jnp.abs(pred - gt).mean()))
        init_dists.append(float(jnp.abs(b["img_x"] - gt).mean()))
    print(f"validation init L1 {np.mean(init_dists):.4f}  "
          f"L1 {np.mean(dists):.4f}")
    return float(np.mean(dists))


def main(argv=None):
    p = argparse.ArgumentParser()
    common.add_base_args(p)
    common.add_train_args(p)
    p.add_argument("--data_parallel", type=int, default=1,
                   help="shard the batch over all local devices")
    p.add_argument("--fs_only", action="store_true",
                   help="ablation: purely supervised, no episode-L1 phase "
                        "(reference experiments/t2onet-L1/train_actor_fs.py)")
    p.add_argument("--per_step_bn", action="store_true",
                   help="reference-exact per-step BatchNorm statistics in "
                        "the supervised phase (slower; default batches all "
                        "decode steps into one vis-encoder forward)")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler device trace of N steps "
                        "(after warmup) into {run_dir}/profile")
    p.add_argument("--wire_u8", type=int, default=1, choices=(0, 1),
                   help="ship train images host->device as uint8 and "
                        "normalize on device (within 1 ulp of the float32 "
                        "path — the JPEGs are 8-bit and resize runs on "
                        "uint8 either way; 4x less wire traffic, the "
                        "bottleneck through the single-chip tunnel). "
                        "File-backed datasets (FiveK/GIER) only")
    p.add_argument("--pallas_exec", type=int, default=-1, choices=(-1, 0, 1),
                   help="episode phase executes ops via the fused Pallas "
                        "step kernel (custom VJP, selected branch only — "
                        "~1.5x faster episode steps, identical gradients). "
                        "-1 (default): auto — on for SINGLE-CHIP TPU runs; "
                        "off on CPU (only the slow interpreter exists) and "
                        "under --data_parallel meshes (pass 1 to force)")
    p.add_argument("--episode_probe", type=int, default=0,
                   help="episode rollout decodes at this probe resolution "
                        "(bilinear view for the vis encoder) while "
                        "operators + L1 loss run at full train_size — the "
                        "serve.py two-stage design applied to training "
                        "(the 5 sequential ResNet decodes bound the "
                        "episode step). 0 = off (reference-exact). "
                        "Convergence A/B: docs/ROADMAP.md round-5")
    a = p.parse_args(argv)
    common.maybe_force_cpu(a)
    run_dir = common.resolve_run_dir(a)

    train_ds, vocab2id, id2op, w2v = common.build_dataset_and_vocab(
        a, "train", wire_u8=bool(a.wire_u8))
    val_ds, _, _, _ = common.build_dataset_and_vocab(a, "val", eval_img_mode="train_size")
    actor, cfg = common.build_actor(a, len(vocab2id), w2v)

    from t2onet_tpu.data.loader import Prefetcher, device_put_batch

    sample = next(train_ds.batches(a.batch_size, 1, shuffle=False))
    init_b = device_put_batch({"x": sample["x"], "img_x": sample["img_x"]})
    state = create_train_state(
        actor, jax.random.PRNGKey(a.manual_seed),
        init_b["x"], init_b["img_x"],
        learning_rate=a.learning_rate)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"model: {n_params / 1e6:.2f}M params")

    mesh = None
    if a.data_parallel and len(jax.devices()) > 1:
        mesh = make_mesh()
        print(f"data-parallel over {len(mesh.devices.ravel())} devices")

    ckpt = CheckpointManager(os.path.join(run_dir, "seq2seqL1_model"),
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

    logger = common.ScalarLogger(run_dir)
    # GIER local editing: thread the gt masks emitted by
    # GIERDatasetAct.batches(is_load_mask) into the episode phase
    use_masks = bool(getattr(a, "is_load_mask", 0)) and "step_masks" in sample
    if getattr(a, "is_load_mask", 0) and not use_masks:
        print("warning: --is_load_mask set but the dataset emitted no "
              "masks (no mask annotations?) — training global-only")
    # masks only reach the EPISODE phase: the supervised loss never
    # consumes executed images (see make_supervised_step docstring)
    sup_step = make_supervised_step(actor, mesh=mesh,
                                    per_step_bn=a.per_step_bn)
    pallas_exec = (jax.default_backend() == "tpu" and mesh is None
                   if a.pallas_exec == -1 else bool(a.pallas_exec))
    print(f"episode executor: "
          f"{'fused Pallas step kernel' if pallas_exec else 'one-hot bank'}"
          + (" (auto: pallas needs a single-chip TPU run)"
             if a.pallas_exec == -1 and not pallas_exec else ""))
    if a.episode_probe:
        print(f"[train] episode probe resolution: {a.episode_probe}px "
              f"(exec/loss at {a.img_size}px)", flush=True)
    epi_step = make_episode_step(actor, mesh=mesh, sample=True,
                                 probe_size=a.episode_probe or None,
                                 with_masks=use_masks,
                                 pallas_exec=pallas_exec)
    eval_fn = make_eval_episode(actor)

    from t2onet_tpu.parallel.mesh import batch_sharding

    sh = batch_sharding(mesh) if mesh is not None else None

    import itertools

    stage_itr = itertools.count(start_itr)

    def stage(b):
        # Phase-aware transfer: the prefetch thread knows each batch's
        # iteration parity (consumption order == production order), so it
        # ships only what that phase consumes. The episode phase needs
        # just img_x + the FINAL teacher image — shipping the whole
        # (B,T,3,H,W) img_y stack to slice [:, -1] on device wasted ~75
        # MB/it of tunnel bandwidth at bs64/128px, the measured training
        # bottleneck. ('req' is host-side text; 'step_masks' is the raw
        # per-step mask tensor the episode step never consumes — it takes
        # the per-vocab 'masks_vocab' form.)
        sup = a.fs_only or next(stage_itr) % 2 == 1
        if sup:
            keep = {k: b[k] for k in ("x", "y", "img_x", "img_y",
                                      "gt_params")}
        else:
            keep = {"x": b["x"], "img_x": b["img_x"],
                    "gt_img": b["img_y"][:, -1]}
            if use_masks:
                keep["masks_vocab"] = b["masks_vocab"]
        return sup, device_put_batch(keep, sh)

    rng = jax.random.PRNGKey(a.manual_seed + 1)
    if start_itr > 1:   # resumed: don't replay the pre-crash episode noise
        rng = jax.random.fold_in(rng, start_itr)
    n_left = max(a.num_iters - start_itr + 1, 0)
    it = Prefetcher(train_ds.batches(a.batch_size, n_left, shuffle=True),
                    to_device=stage, depth=2)
    # metric sums stay on device between prints — a float() per step would
    # force a ~30ms tunnel round-trip per iteration
    sums = {"op_loss": jnp.zeros(()), "param_loss": jnp.zeros(()),
            "L1_loss": jnp.zeros(())}
    counts = {k: 0 for k in sums}
    tik = time.time()
    # profile window: steps prof_start..prof_start+N-1, after both phase
    # graphs are warm (compiled)
    prof_start = start_itr + 4 if a.profile_steps else -1
    prof_stop = prof_start + a.profile_steps - 1
    prof_open = False
    try:
        for itr, (sup, jb) in enumerate(it, start=start_itr):
            if itr == prof_start:
                import jax.profiler as _prof

                _prof.start_trace(os.path.join(run_dir, "profile"))
                prof_open = True
            if sup:                             # supervised phase
                state, m = sup_step(state, jb)
            else:                  # episode L1 phase
                rng, sub = jax.random.split(rng)
                state, m = epi_step(state, jb, sub)
            for k, v in m.items():
                if k in sums:
                    sums[k] = sums[k] + v
                    counts[k] += 1
            if prof_open and itr >= prof_stop:
                import jax.profiler as _prof

                jax.block_until_ready(state.params)
                _prof.stop_trace()
                prof_open = False
                print(f"profile trace ({itr - prof_start + 1} steps) -> "
                      f"{os.path.join(run_dir, 'profile')}", flush=True)

            if itr % a.print_every == 0:
                avg = {k: float(sums[k]) / max(counts[k], 1) for k in sums}
                sums = {k: jnp.zeros(()) for k in sums}
                counts = {k: 0 for k in counts}
                dt = (time.time() - tik) / a.print_every
                tik = time.time()
                print(f"iter {itr:6d}/{a.num_iters} op {avg['op_loss']:.3f} "
                      f"param {avg['param_loss']:.3f} L1 {avg['L1_loss']:.3f} "
                      f"{dt * 1e3:.0f} ms/it", flush=True)
                logger.log(itr, **avg)

            if itr % a.checkpoint_every == 0 or itr >= a.num_iters:
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
            if itr >= a.num_iters:
                break
    finally:
        it.close()
    if prof_open:                       # run ended inside the profile window
        import jax.profiler as _prof

        jax.block_until_ready(state.params)
        _prof.stop_trace()
    print("training done")


if __name__ == "__main__":
    main()
