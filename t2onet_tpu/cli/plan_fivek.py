"""Planner driver: generate pseudo-gt action sequences for FiveK.

Spec: reference preprocess/gen_greedy_seqs_FiveK.py (beam 3, ops
[0,1,2,3,5,6], err 1e-2, L1) — with the on-device vmapped fitter instead
of scipy Nelder-Mead. Candidate distances: 'l1' / 'l2' pixel distance
(reference beam_search.py:170-180) or 'seq2seqGAN-disc' — a trained
text-conditioned discriminator scores candidates (beam_search.py:190-193,
226-236; the planner output FiveKActDVisualize consumes).

  python -m t2onet_tpu.cli.plan_fivek --synthetic --limit 8 \
      --out_dir output/actions_set_1 --phase train
  python -m t2onet_tpu.cli.plan_fivek --synthetic --limit 8 \
      --dist_type seq2seqGAN-disc --disc_run_dir output/FiveK_trial_1
"""

from __future__ import annotations

import argparse


from t2onet_tpu.cli import common
from t2onet_tpu.planner.generate import plan_dataset

DISC_DIST = "seq2seqgan-disc"


def build_disc_distance(a, vocab2id, w2v):
    """Load a train_gan run's actor + discriminator and build the planner's
    learned-distance hooks: (score_fn, score_aux_fn).

    The reference's equivalent is load_seq2seqgan_disc (beam_search.py:
    52-63): restore the whole GAN model, score candidates with
    1 - sigmoid(D(I_0, I_out | text)). The discriminator runs with
    current-batch BN statistics, matching the reference's module left in
    train mode.
    """
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from t2onet_tpu.cli.train_gan import DiscBundle
    from t2onet_tpu.data.text import txt2idx
    from t2onet_tpu.models.gan import make_disc_planner_score
    from t2onet_tpu.train.checkpoint import (CheckpointManager,
                                             PytreeCheckpointer)
    from t2onet_tpu.train.loop import create_train_state

    if not a.disc_run_dir and not a.torch_gan_ckpt:
        raise SystemExit("--dist_type seq2seqGAN-disc needs --disc_run_dir "
                         "(a cli.train_gan run directory) or "
                         "--torch_gan_ckpt (a reference model.pth)")

    actor, _cfg = common.build_actor(a, len(vocab2id), w2v)
    state = create_train_state(
        actor, jax.random.PRNGKey(0),
        jnp.zeros((1, a.encoder_max_len), jnp.int32),
        jnp.zeros((1, 3, a.img_size, a.img_size)))
    bundle = DiscBundle(ndf=64, n_layers=a.n_layers_D, num_D=a.num_D)
    img6 = jnp.zeros((1, 6, a.img_size, a.img_size))
    hid0 = jnp.zeros((a.n_layers, 1, 2 * a.hidden_size))
    d_params, d_bs = bundle.init(jax.random.PRNGKey(0), img6, hid0)

    if a.torch_gan_ckpt:
        from t2onet_tpu.convert.torch_checkpoint import (
            load_torch_gan_checkpoint)

        actor_conv, (dp, ds) = load_torch_gan_checkpoint(
            a.torch_gan_ckpt, num_D=a.num_D, n_layers_D=a.n_layers_D,
            n_layers=a.n_layers)
        if actor_conv is not None:
            state = state.replace(params=actor_conv[0],
                                  batch_stats=actor_conv[1])
        d_params, d_bs = dp, ds
    else:
        ckpt_dir = os.path.join(a.disc_run_dir, "seq2seqGAN_model")
        state = CheckpointManager(ckpt_dir).restore(state, which=a.which_ckpt)
        # an explicit --which_ckpt path names the ACTOR checkpoint; the disc
        # twin lives at disc/<same basename>
        d_which = a.which_ckpt
        if d_which not in ("best", "latest"):
            d_which = os.path.join(ckpt_dir, "disc",
                                   os.path.basename(os.path.normpath(d_which)))
        tree = PytreeCheckpointer(os.path.join(ckpt_dir, "disc")).restore(
            {"d_params": d_params, "d_batch_stats": d_bs}, which=d_which)
        d_params, d_bs = tree["d_params"], tree["d_batch_stats"]

    # eval-mode BN throughout: train-mode BatchNorm1d on a single request
    # would normalize the cond vector to a constant (erasing the text
    # conditioning), and train-mode disc BN would couple each candidate's
    # score to the rest of the fitting batch
    score_fn = make_disc_planner_score(
        bundle.disc_apply(d_params, d_bs, train=False))

    @jax.jit
    def encode(x):
        _, (h, _), _ = actor.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, method=lambda m, xx: m.lang_encoder(xx))
        return h

    def score_aux_fn(img_x, request):
        x = txt2idx(request, vocab2id, a.encoder_max_len)[0].astype(np.int32)
        h = encode(jnp.asarray(x)[None])
        cond = bundle.apply(d_params, d_bs, None, h, train=False)[0]
        return (jnp.asarray(np.asarray(img_x)), cond)

    return score_fn, score_aux_fn


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
    p.add_argument("--data_parallel", type=int, default=1,
                   help=">1: shard the lockstep pair fits over N devices "
                        "(multi-chip planning; needs --pair_batch > 1)")
    p.add_argument("--dist_type", default="l1",
                   help="l1 / l2 (reference 'L1'/'L2') or seq2seqGAN-disc")
    p.add_argument("--disc_run_dir", default=None,
                   help="train_gan run dir (for --dist_type seq2seqGAN-disc)")
    p.add_argument("--torch_gan_ckpt", default=None,
                   help="reference seq2seqGAN model.pth — converted actor "
                        "+ discriminator drive the disc distance")
    p.add_argument("--which_ckpt", default="best",
                   help="best / latest / explicit checkpoint path")
    p.add_argument("--num_D", type=int, default=2)
    p.add_argument("--n_layers_D", type=int, default=3)
    a = p.parse_args(argv)
    common.maybe_force_cpu(a)

    if a.synthetic:
        ds, vocab2id, _, w2v = common.build_dataset_and_vocab(a, a.phase)

        def pairs():
            for i in range(a.start, len(ds)):
                img, imgs, _, _, _, req = ds.make_item(i)
                yield img[None], imgs[-1][None], req
    else:
        # planning happens BEFORE actions exist: use the plain pair loader
        # (the Act dataset would try to read the planner output)
        import os

        from t2onet_tpu.data.fivek import FiveK

        # train_size: planning fits need ONE compiled shape (native-res
        # val/test images would crash the batched concatenate and retrace
        # the fitter per aspect ratio)
        ds = FiveK(os.path.join(a.data_dir, "FiveK", "images"),
                   os.path.join(a.data_dir, "FiveK", "annotations"),
                   a.phase, a.session, a.img_size,
                   eval_img_mode="train_size")
        vocab2id = w2v = None          # loaded only by the disc distance

        def pairs():
            for i in range(a.start, len(ds)):
                img_x, img_y, _, req = ds[i]
                yield img_x[None], img_y[None], req

    kw = dict(beam_size=a.beam_size, err=a.err, mode=a.mode,
              n_starts=a.n_starts, n_iters=a.n_iters, lr=a.lr,
              seed=a.manual_seed)
    score_aux_fn = None
    if a.dist_type.lower() in (DISC_DIST, "disc"):
        if a.pair_batch > 1:
            raise SystemExit("--dist_type seq2seqGAN-disc plans pairs one "
                             "at a time (drop --pair_batch)")
        if vocab2id is None:
            import os

            from t2onet_tpu.data.text import load_vocab, load_embedding

            vocab_dir = os.path.join(a.data_dir, "language")
            vocab2id, _, _, _ = load_vocab(vocab_dir, a.dataset, a.session)
            glove = os.path.join(
                vocab_dir, f"{a.dataset}_vocabs_glove_feat_{a.session}.h5")
            w2v = load_embedding(glove) if os.path.exists(glove) else None
        kw["score_fn"], score_aux_fn = build_disc_distance(a, vocab2id, w2v)
    else:
        kw["dist_type"] = a.dist_type
    if a.data_parallel > 1 and a.pair_batch <= 1:
        raise SystemExit("--data_parallel shards the lockstep pair fits — "
                         "it needs --pair_batch > 1")

    if a.pair_batch > 1:
        from t2onet_tpu.planner.generate import plan_dataset_batched

        if a.data_parallel > 1:
            from t2onet_tpu.parallel.mesh import make_mesh

            kw["mesh"] = make_mesh(n_devices=a.data_parallel)
        plan_dataset_batched(pairs(), a.out_dir, phase=a.phase,
                             pair_batch=a.pair_batch, limit=a.limit,
                             start_index=a.start, **kw)
    else:
        plan_dataset(pairs(), a.out_dir, phase=a.phase, limit=a.limit,
                     start_index=a.start, score_aux_fn=score_aux_fn, **kw)


if __name__ == "__main__":
    main()
