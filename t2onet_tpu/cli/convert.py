"""Convert a reference PyTorch checkpoint into a run directory.

The reference distributes trained weights as `model.pth` state_dicts
(README.md:100,118 — FiveK trial 1 / GIER trial 7) and loads them with
`strict=False` (test_seq2seqL1.py:159, demo/seq2seqL1.py:129). This CLI
turns such a file into an orbax checkpoint laid out exactly like a
`cli.train_fivek` / `cli.train_gan` run, so every downstream tool
(`test_fivek`, `demo`, `serve`, `plan_fivek --disc_run_dir`) consumes
converted reference weights with no extra flags:

    python -m t2onet_tpu.cli.convert --torch_ckpt model.pth \
        --run_dir output/converted --synthetic
    python -m t2onet_tpu.cli.test_fivek --run_dir output/converted ...

`--kind gan` additionally converts the discriminator scales + condition
encoder (reference seq2seqGAN model.pth) into the `disc/` twin that
`plan_fivek --dist_type seq2seqGAN-disc` restores.

The model geometry comes from the same flags as the trainers (hidden
size, layers, ranges...); the vocab comes from the dataset flags (or
`--vocab_size` to skip dataset access entirely).
"""

from __future__ import annotations

import argparse
import os

from t2onet_tpu.cli import common


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    common.add_base_args(p)
    p.add_argument("--torch_ckpt", required=True,
                   help="reference model.pth (torch state_dict)")
    p.add_argument("--kind", choices=("actor", "gan"), default="actor",
                   help="actor = seq2seqL1 model.pth; gan = seq2seqGAN "
                        "model.pth (actor + multiscale D + cond encoder)")
    p.add_argument("--vocab_size", type=int, default=0,
                   help="skip dataset/vocab loading and use this size "
                        "(must match the checkpoint's embedding rows)")
    p.add_argument("--num_D", type=int, default=2)
    p.add_argument("--n_layers_D", type=int, default=3)
    a = p.parse_args(argv)
    common.maybe_force_cpu(a)
    run_dir = common.resolve_run_dir(a)

    import jax
    import jax.numpy as jnp

    from t2onet_tpu.train.checkpoint import (CheckpointManager,
                                             PytreeCheckpointer)
    from t2onet_tpu.train.loop import create_train_state

    if a.vocab_size:
        vocab_size, w2v = a.vocab_size, None
    else:
        _, vocab2id, _, w2v = common.build_dataset_and_vocab(a, "train")
        vocab_size = len(vocab2id)
    actor, _cfg = common.build_actor(a, vocab_size, w2v)
    state = create_train_state(
        actor, jax.random.PRNGKey(a.manual_seed),
        jnp.zeros((1, a.encoder_max_len), jnp.int32),
        jnp.zeros((1, 3, a.img_size, a.img_size)))

    if a.kind == "actor":
        from t2onet_tpu.convert.torch_checkpoint import load_torch_checkpoint

        params, stats = load_torch_checkpoint(a.torch_ckpt,
                                              n_layers=a.n_layers)
        state = state.replace(params=params, batch_stats=stats)
        ckpt_name = "seq2seqL1_model"
    else:
        from t2onet_tpu.convert.torch_checkpoint import (
            load_torch_gan_checkpoint)

        actor_conv, (d_params, d_bs) = load_torch_gan_checkpoint(
            a.torch_ckpt, num_D=a.num_D, n_layers_D=a.n_layers_D,
            n_layers=a.n_layers)
        if actor_conv is None:
            raise SystemExit(f"{a.torch_ckpt} holds no actor weights — "
                             "a disc-only checkpoint cannot seed a run dir")
        state = state.replace(params=actor_conv[0],
                              batch_stats=actor_conv[1])
        ckpt_name = "seq2seqGAN_model"
        PytreeCheckpointer(os.path.join(run_dir, ckpt_name, "disc")).save(
            {"d_params": d_params, "d_batch_stats": d_bs}, 0, best=True)

    # Re-conversion must fully replace a previous one: stale stats.json
    # would keep best_val_dist=0.0 and `0.0 < 0.0` never refreshes
    # checkpoint_best, silently serving the OLD weights (and, for gan, an
    # actor-best/disc-best pair from DIFFERENT conversions).
    import shutil

    ckpt_dir = os.path.join(run_dir, ckpt_name)
    for stale in ("stats.json", "checkpoint_best"):
        path = os.path.join(ckpt_dir, stale)
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)
    # val_dist=0.0 marks the imported weights as checkpoint_best, which is
    # what test_fivek/demo/serve restore by default
    CheckpointManager(ckpt_dir).save(state, 0, val_dist=0.0)
    n = sum(int(x.size) for x in jax.tree_util.tree_leaves(state.params))
    print(f"converted {a.torch_ckpt} ({a.kind}, {n:,} params) -> "
          f"{os.path.join(run_dir, ckpt_name)}")


if __name__ == "__main__":
    main()
