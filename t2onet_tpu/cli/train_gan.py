"""T2ONet+D trainer: alternating supervised / conditional-GAN phases.

Spec: reference experiments/t2onet+D-L1/train_seq2seqGAN.py — odd iters
teacher-forced (same as the plain trainer); even iters: actor rollout ->
<END> image -> text-conditioned multiscale D; loss_G = G_GAN + G_GAN_Feat
(+ G_VGG if a perceptual fn is plugged) via optimizer_G over the ACTOR,
loss_D = (D_fake + D_real)/2 via optimizer_D over D + cond-encoder; a
third optimizer (fs) handles the supervised phase — all Adam.

  python -m t2onet_tpu.cli.train_gan --cpu --synthetic --num_iters 20 ...
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from t2onet_tpu.cli import common
from t2onet_tpu.models.actor import Actor, select_end_images
from t2onet_tpu.models.gan import (
    ConditionEncoding,
    MultiscaleDiscriminator,
    Seq2SeqGANLosses,
)
from t2onet_tpu.train.checkpoint import CheckpointManager, PytreeCheckpointer
from t2onet_tpu.train.loop import (
    create_train_state,
    make_eval_episode,
    make_supervised_step,
)
from t2onet_tpu.cli.train_fivek import evaluate


class GANState(flax.struct.PyTreeNode):
    d_params: Any
    d_batch_stats: Any
    d_opt: Any
    g_opt: Any


class DiscBundle:
    """Discriminator + condition encoder under one param tree."""

    def __init__(self, cond_nc=512, ndf=64, n_layers=3, num_D=2):
        self.disc = MultiscaleDiscriminator(cond_nc=cond_nc, ndf=ndf,
                                            n_layers=n_layers, num_D=num_D)
        self.cond = ConditionEncoding(cond_nc=cond_nc)

    def init(self, rng, img6, hidden):
        r1, r2 = jax.random.split(rng)
        cv = self.cond.init(r1, hidden)
        cond0 = jnp.zeros((img6.shape[0], self.cond.cond_nc))
        dv = self.disc.init(r2, img6, cond0)
        return ({"disc": dv["params"], "cond": cv["params"]},
                {"disc": dv.get("batch_stats", {}),
                 "cond": cv.get("batch_stats", {})})

    def apply(self, params, batch_stats, _img6_unused, cond_hidden,
              train=True):
        """Encode the text condition; returns (cond code, cond batch_stats).

        Training losses use current-batch BN stats (matching the reference,
        whose D stays in torch train mode); running averages are refreshed
        once per GAN iter via update_stats so EVAL-mode use — the planner's
        seq2seqGAN-disc distance — sees real statistics. (Eval mode is
        required there: train-mode BatchNorm1d on a single request
        normalizes the cond vector to a constant, erasing the text
        conditioning; the reference would error outright on batch 1.)"""
        cv = {"params": params["cond"], "batch_stats": batch_stats["cond"]}
        if train:
            cond, cu = self.cond.apply(cv, cond_hidden, train=True,
                                       mutable=["batch_stats"])
            return cond, cu["batch_stats"]
        return self.cond.apply(cv, cond_hidden, train=False), \
            batch_stats["cond"]

    def disc_apply(self, params, batch_stats, train=True):
        def f(x6, cond):
            dv = {"params": params["disc"],
                  "batch_stats": batch_stats["disc"]}
            if train:
                out, _ = self.disc.apply(dv, x6, cond, train=True,
                                         mutable=["batch_stats"])
            else:
                out = self.disc.apply(dv, x6, cond, train=False)
            return out
        return f

    def update_stats(self, params, batch_stats, x6, cond_hidden):
        """One train-mode forward that RETURNS the updated BN running
        averages (flax mutable) — called once per GAN iter so checkpoints
        carry usable eval-mode statistics for the planner distance."""
        cv = {"params": params["cond"], "batch_stats": batch_stats["cond"]}
        cond, cu = self.cond.apply(cv, cond_hidden, train=True,
                                   mutable=["batch_stats"])
        dv = {"params": params["disc"], "batch_stats": batch_stats["disc"]}
        _, du = self.disc.apply(dv, x6, cond, train=True,
                                mutable=["batch_stats"])
        return {"cond": cu["batch_stats"], "disc": du["batch_stats"]}


def last_valid_teacher(img_y):
    """Last non-black intermediate planner edit per sample — the AdaptGAN
    pseudo-real (reference seq2seqAdaptGAN.py:85-111). FiveKAct zero-pads
    the teacher images past the trajectory truncation point, so a fixed
    slot like img_y[:, -2] would feed black frames to D_real.

    Host-side numpy (runs on the prefetch thread): selecting the one
    pseudo-real frame BEFORE transfer avoids shipping the whole teacher
    stack on GAN iters just to pick a slice on device."""
    inter = img_y[:, :-1]                              # drop the gt slot
    valid = np.abs(inter.astype(np.int64) if img_y.dtype == np.uint8
                   else inter).sum(axis=(2, 3, 4)) > 0  # (B, T-2)
    t = valid.shape[1]
    idx = t - 1 - np.argmax(valid[:, ::-1].astype(np.int32), axis=1)
    idx = np.where(valid.any(axis=1), idx, 0)
    return np.take_along_axis(
        inter, idx[:, None, None, None, None], axis=1)[:, 0]


def make_gan_step(actor, bundle, losses, tx_g, tx_d, mesh=None,
                  state_sharding=None):
    """Build the jitted GAN iteration: G update (actor) + D update.

    Spec: reference experiments/t2onet+D-L1/train_seq2seqGAN.py:77-130 —
    loss_G = G_GAN + G_GAN_Feat (+ G_VGG) over the actor via optimizer_G,
    loss_D = (D_fake + D_real)/2 over D + cond-encoder via optimizer_D.

    mesh: optional jax.sharding.Mesh. The batch shards over the mesh's
    data axis; the actor state follows state_sharding (parallel/mesh.py
    2-D layouts supported); the GAN side (multiscale D + cond encoder +
    both Adam moment trees) is replicated — D is ~1% of the actor's
    FLOPs, so DP with GSPMD-inserted gradient psums is the right layout.
    """

    def gan_step(state, gan, batch, rng):
        def rollout(params):
            out, upd = actor.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["x"], batch["img_x"], rng=rng, sample=True, train=True,
                mutable=["batch_stats"], method=Actor.episode)
            fake = select_end_images(out["imgs"], out["ops"])
            return fake, upd["batch_stats"]

        # text condition from the (frozen) encoder hidden (seq2seqGAN.py:88-90)
        _, (enc_h, _), _ = actor.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["x"], method=lambda m, x: m.lang_encoder(x))
        enc_h = jax.lax.stop_gradient(enc_h)

        def g_loss_fn(params):
            fake, new_bs = rollout(params)
            cond, cbs = bundle.apply(gan.d_params, gan.d_batch_stats,
                                     None, enc_h, train=True)
            ld = losses(bundle.disc_apply(gan.d_params, gan.d_batch_stats),
                        batch["img_x"], fake, batch["gt_img"], cond,
                        pseudo_real=batch.get("pseudo_real"), parts="g")
            g = ld["G_GAN"] + ld["G_GAN_Feat"] + ld["G_VGG"]
            return g, (ld, fake, new_bs)

        (g_total, (ld, fake, new_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.params)
        g_updates, g_opt = tx_g.update(g_grads, gan.g_opt, state.params)
        new_actor_params = optax.apply_updates(state.params, g_updates)

        def d_loss_fn(d_params):
            cond, _ = bundle.apply(d_params, gan.d_batch_stats, None, enc_h,
                                   train=True)
            ld2 = losses(bundle.disc_apply(d_params, gan.d_batch_stats),
                         batch["img_x"], jax.lax.stop_gradient(fake),
                         batch["gt_img"], cond,
                         pseudo_real=batch.get("pseudo_real"), parts="d")
            return 0.5 * (ld2["D_fake"] + ld2["D_real"]), ld2

        (d_total, ld2), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(gan.d_params)
        d_updates, d_opt = tx_d.update(d_grads, gan.d_opt, gan.d_params)
        new_d_params = optax.apply_updates(gan.d_params, d_updates)

        new_d_bs = bundle.update_stats(
            new_d_params, gan.d_batch_stats,
            jnp.concatenate([batch["img_x"], batch["gt_img"]], axis=1),
            enc_h)
        state = state.replace(params=new_actor_params, batch_stats=new_bs,
                              step=state.step + 1)
        gan = gan.replace(d_params=new_d_params, d_batch_stats=new_d_bs,
                          d_opt=d_opt, g_opt=g_opt)
        metrics = {"G_loss": g_total, "D_loss": d_total,
                   "G_GAN": ld["G_GAN"], "G_GAN_Feat": ld["G_GAN_Feat"],
                   "D_real": ld2["D_real"], "D_fake": ld2["D_fake"]}
        return state, gan, metrics

    if mesh is None:
        return jax.jit(gan_step)
    from t2onet_tpu.parallel.mesh import batch_sharding, replicated

    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    st = rep if state_sharding is None else state_sharding
    return jax.jit(gan_step, in_shardings=(st, rep, bs, rep),
                   out_shardings=(st, rep, rep))


def main(argv=None):
    p = argparse.ArgumentParser()
    common.add_base_args(p)
    common.add_train_args(p)
    p.add_argument("--gan_lr", type=float, default=2e-4)
    p.add_argument("--beta1", type=float, default=0.5)
    p.add_argument("--num_D", type=int, default=2)
    p.add_argument("--n_layers_D", type=int, default=3)
    p.add_argument("--lambda_feat", type=float, default=10.0)
    p.add_argument("--adapt_pseudo_real", type=int, default=0,
                   help="AdaptGAN: use the last planner edit as pseudo-real")
    p.add_argument("--wire_u8", type=int, default=1, choices=(0, 1),
                   help="uint8 host->device image wire + on-device /255 "
                        "(within 1 ulp; see cli/train_fivek.py). FiveK "
                        "file datasets only")
    p.add_argument("--vgg_ckpt", default=None,
                   help="torchvision vgg19 .pth — enables the G_VGG "
                        "perceptual term (reference VGGLoss, "
                        "networks.py:113-125); without it G_VGG is 0, "
                        "matching the reference's --no_vgg_loss")
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

    bundle = DiscBundle(ndf=64, n_layers=a.n_layers_D, num_D=a.num_D)
    img6 = jnp.zeros((a.batch_size, 6, a.img_size, a.img_size))
    hid0 = jnp.zeros((a.n_layers, a.batch_size, 2 * a.hidden_size))
    d_params, d_bs = bundle.init(jax.random.PRNGKey(a.manual_seed + 7),
                                 img6, hid0)
    tx_d = optax.adam(a.gan_lr, b1=a.beta1, b2=0.999)
    tx_g = optax.adam(a.gan_lr, b1=a.beta1, b2=0.999)
    gan = GANState(d_params=d_params, d_batch_stats=d_bs,
                   d_opt=tx_d.init(d_params), g_opt=tx_g.init(state.params))
    perceptual_fn = None
    if a.vgg_ckpt:
        from t2onet_tpu.models.vgg import load_vgg19

        _, perceptual_fn = load_vgg19(a.vgg_ckpt)
    losses = Seq2SeqGANLosses(n_layers=a.n_layers_D, num_D=a.num_D,
                              lambda_feat=a.lambda_feat,
                              perceptual_fn=perceptual_fn)

    sup_step = make_supervised_step(actor, donate=False)
    eval_fn = make_eval_episode(actor)

    gan_step = make_gan_step(actor, bundle, losses, tx_g, tx_d)

    ckpt = CheckpointManager(os.path.join(run_dir, "seq2seqGAN_model"),
                             max_to_keep=a.max_keep_ckpts or None)
    # the discriminator rides along (the planner's 'seq2seqGAN-disc'
    # distance restores it — cli/plan_fivek.py --dist_type seq2seqGAN-disc);
    # its tree stays weights-only for planner compat, so the G/D optimizer
    # moments resume from a separate twin
    d_ckpt = PytreeCheckpointer(os.path.join(run_dir, "seq2seqGAN_model",
                                             "disc"),
                                max_to_keep=a.max_keep_ckpts or None)
    opt_ckpt = PytreeCheckpointer(os.path.join(run_dir, "seq2seqGAN_model",
                                               "gan_opt"),
                                  max_to_keep=a.max_keep_ckpts or None)
    start_itr = 1
    if a.resume:
        try:
            state = ckpt.restore(state, "latest")
            start_itr = int(state.step) + 1
            tree = d_ckpt.restore({"d_params": gan.d_params,
                                   "d_batch_stats": gan.d_batch_stats},
                                  "latest")
            gan = gan.replace(d_params=tree["d_params"],
                              d_batch_stats=tree["d_batch_stats"])
            try:
                opts = opt_ckpt.restore({"d_opt": gan.d_opt,
                                         "g_opt": gan.g_opt}, "latest")
                gan = gan.replace(d_opt=opts["d_opt"], g_opt=opts["g_opt"])
            except FileNotFoundError:
                print("--resume: no gan_opt checkpoint; G/D Adam moments "
                      "start fresh")
            print(f"resumed from iter {int(state.step)}")
        except FileNotFoundError:
            print("--resume: no checkpoint found, starting fresh")
    logger = common.ScalarLogger(run_dir)
    rng = jax.random.PRNGKey(a.manual_seed + 1)
    if start_itr > 1:   # resumed: don't replay the pre-crash episode noise
        rng = jax.random.fold_in(rng, start_itr)
    tik = time.time()
    n_left = max(a.num_iters - start_itr + 1, 0)

    import itertools

    stage_itr = itertools.count(start_itr)

    def stage(b):
        # Phase-aware H2D staging on the prefetch thread (see
        # cli/train_fivek.py): GAN iters ship img_x + final gt (+ the one
        # host-selected pseudo-real frame), never the whole teacher stack.
        sup = next(stage_itr) % 2 == 1
        if sup:
            keep = {k: b[k] for k in ("x", "y", "img_x", "img_y",
                                      "gt_params")}
        else:
            keep = {"x": b["x"], "img_x": b["img_x"],
                    "gt_img": b["img_y"][:, -1]}
            if a.adapt_pseudo_real:
                keep["pseudo_real"] = last_valid_teacher(b["img_y"])
        return sup, device_put_batch(keep)

    it = Prefetcher(train_ds.batches(a.batch_size, n_left, shuffle=True),
                    to_device=stage, depth=2)
    try:
        for itr, (sup, jb) in enumerate(it, start=start_itr):
            if sup:
                state, m = sup_step(state, jb)
            else:
                rng, sub = jax.random.split(rng)
                state, gan, m = gan_step(state, gan, jb, sub)
            if itr % a.print_every == 0:
                dt = (time.time() - tik) / a.print_every
                tik = time.time()
                print(f"iter {itr}/{a.num_iters} "
                      + " ".join(f"{k} {float(v):.3f}" for k, v in m.items())
                      + f" {dt * 1e3:.0f} ms/it", flush=True)
                logger.log(itr, **{k: float(v) for k, v in m.items()})
            if itr % a.checkpoint_every == 0 or itr >= a.num_iters:
                val = evaluate(actor, state, val_ds, min(a.batch_size, 16),
                               4, eval_fn)
                is_best = ckpt.save(state, itr, val)
                d_ckpt.save({"d_params": gan.d_params,
                             "d_batch_stats": gan.d_batch_stats},
                            itr, best=is_best)
                opt_ckpt.save({"d_opt": gan.d_opt, "g_opt": gan.g_opt}, itr)
            if itr >= a.num_iters:
                break
    finally:
        it.close()
    print("GAN training done")


if __name__ == "__main__":
    main()
