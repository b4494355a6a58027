"""T2ONet+D: text-conditioned multiscale PatchGAN discriminator.

Spec: reference models/seq2seqGAN/networks.py — NLayerDiscriminator
(networks.py:359-424: 4x4 convs, stride 2 x n_layers, the 512-d sentence
code spatially broadcast + concatenated mid-stack), MultiscaleDiscriminator
over num_D avg-pooled scales (networks.py:309-356), ConditionEncoding over
the flattened encoder hidden (networks.py:294-306), LSGAN/BCE GANLoss
(networks.py:69-111), and the Pix2PixHD-style loss assembly of
seq2seqGAN.py:71-117 (D_fake / D_real / G_GAN / G_GAN_Feat / G_VGG).

The generator is the Actor itself (its rollout image at <END>), exactly as
in the reference. The VGG perceptual loss requires pretrained weights the
reference downloads via torchvision; here it is a pluggable `perceptual_fn`
(defaults to off — this environment has no egress).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConditionEncoding(nn.Module):
    """Flattened encoder hidden (layers*dirs*hid = 1024) -> cond code
    (reference networks.py:294-306)."""

    cond_nc: int = 512

    @nn.compact
    def __call__(self, hidden, train: bool = True):
        # hidden: (n_layers, B, 2H) direction-concat (our encoder layout)
        h = jnp.transpose(hidden, (1, 0, 2)).reshape(hidden.shape[1], -1)
        h = nn.Dense(self.cond_nc)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(h)
        return nn.leaky_relu(h, 0.2)


class NLayerDiscriminator(nn.Module):
    """PatchGAN with mid-stack text conditioning (networks.py:359-424)."""

    cond_nc: int = 512
    ndf: int = 64
    n_layers: int = 3
    use_sigmoid: bool = False

    @nn.compact
    def __call__(self, x, cond, train: bool = True) -> List[jax.Array]:
        """x (B, C, H, W) NCHW; cond (B, cond_nc). Returns all intermediate
        features, final element = patch logits map."""
        feats = []
        h = jnp.transpose(x, (0, 2, 3, 1))                 # NHWC for convs
        nf = self.ndf
        h = nn.Conv(nf, (4, 4), (2, 2), padding=2)(h)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        for _ in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = nn.Conv(nf, (4, 4), (2, 2), padding=2)(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        # fuse condition: broadcast over the spatial map (networks.py:337-341)
        b, hh, ww, _ = h.shape
        cmap = jnp.broadcast_to(cond[:, None, None, :],
                                (b, hh, ww, self.cond_nc))
        h = jnp.concatenate([h, cmap], axis=-1)
        nf = min(nf * 2, 512)
        h = nn.Conv(nf, (4, 4), (1, 1), padding=2)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(h)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        h = nn.Conv(nf, (4, 4), (1, 1), padding=2)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(h)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        h = nn.Conv(1, (4, 4), (1, 1), padding=2)(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        feats.append(h)
        return feats


def _avg_pool_3s2(x_nchw):
    """AvgPool2d(3, stride 2, pad 1, count_include_pad=False)
    (networks.py:327)."""
    x = jnp.transpose(x_nchw, (0, 2, 3, 1))
    ones = jnp.ones_like(x[..., :1])
    s = nn.avg_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
    cnt = nn.avg_pool(ones, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
    return jnp.transpose(s / cnt, (0, 3, 1, 2))


class MultiscaleDiscriminator(nn.Module):
    """num_D PatchGANs over avg-pooled scales (networks.py:309-356)."""

    cond_nc: int = 512
    ndf: int = 64
    n_layers: int = 3
    num_D: int = 2
    use_sigmoid: bool = False

    @nn.compact
    def __call__(self, x, cond, train: bool = True) -> List[List[jax.Array]]:
        results = []
        cur = x
        for i in range(self.num_D):
            d = NLayerDiscriminator(
                cond_nc=self.cond_nc, ndf=self.ndf, n_layers=self.n_layers,
                use_sigmoid=self.use_sigmoid, name=f"scale{self.num_D-1-i}")
            results.append(d(cur, cond, train))
            if i != self.num_D - 1:
                cur = _avg_pool_3s2(cur)
        return results


def gan_loss(preds: Sequence[Sequence[jax.Array]], target_is_real: bool,
             use_lsgan: bool = True) -> jax.Array:
    """LSGAN MSE (or BCE-with-logits) on the final map of every scale
    (networks.py:101-111)."""
    target = 1.0 if target_is_real else 0.0
    total = 0.0
    for scale in preds:
        pred = scale[-1]
        if use_lsgan:
            total = total + ((pred - target) ** 2).mean()
        else:
            import optax

            total = total + optax.sigmoid_binary_cross_entropy(
                pred, jnp.full_like(pred, target)).mean()
    return total


def feature_matching_loss(pred_fake, pred_real, n_layers: int = 3,
                          num_D: int = 2, lambda_feat: float = 10.0):
    """L1 between D features of fake and (detached) real
    (seq2seqGAN.py:103-110)."""
    feat_w = 4.0 / (n_layers + 1)
    d_w = 1.0 / num_D
    loss = 0.0
    for i in range(num_D):
        for j in range(len(pred_fake[i]) - 1):
            loss = loss + d_w * feat_w * jnp.abs(
                pred_fake[i][j] - jax.lax.stop_gradient(pred_real[i][j])
            ).mean() * lambda_feat
    return loss


class Seq2SeqGANLosses:
    """Loss assembly for one GAN iteration (seq2seqGAN.py:71-117).

    Usage: construct once with static options, call `__call__` inside the
    jitted train step with the discriminator apply function.
    """

    def __init__(self, n_layers: int = 3, num_D: int = 2,
                 use_lsgan: bool = True, lambda_feat: float = 10.0,
                 use_gan_feat: bool = True,
                 perceptual_fn: Optional[Callable] = None):
        self.n_layers = n_layers
        self.num_D = num_D
        self.use_lsgan = use_lsgan
        self.lambda_feat = lambda_feat
        self.use_gan_feat = use_gan_feat
        self.perceptual_fn = perceptual_fn

    def __call__(self, disc_apply, src_img, fake_img, trg_img, cond,
                 pseudo_real: Optional[jax.Array] = None,
                 parts: str = "all"):
        """Returns dict(G_GAN, G_GAN_Feat, G_VGG, D_real, D_fake).

        disc_apply(x (B,6,H,W), cond) -> list of per-scale feature lists.
        pseudo_real: optional planner image used as an extra real
        (the AdaptGAN variant, seq2seqAdaptGAN.py:85-111).
        parts: 'all', 'g' (G_* only — skips the detached-fake D pass), or
        'd' (D_* only — skips the gradient-carrying fake pass). The G and
        D updates each need only their half; computing both in both loss
        closures would run the multiscale discriminator ~2x more than
        necessary per GAN iteration. Unneeded entries are zeros.
        """
        z = jnp.zeros(())
        d_fake = d_real = g_gan = g_feat = g_vgg = z
        pred_real = None
        if parts in ("all", "d"):
            fake_detached = jax.lax.stop_gradient(fake_img)
            pred_fake_pool = disc_apply(
                jnp.concatenate([src_img, fake_detached], axis=1), cond)
            d_fake = gan_loss(pred_fake_pool, False, self.use_lsgan)
        if parts in ("all", "d") or self.use_gan_feat:
            pred_real = disc_apply(
                jnp.concatenate([src_img, trg_img], axis=1), cond)
        if parts in ("all", "d"):
            d_real = gan_loss(pred_real, True, self.use_lsgan)
            if pseudo_real is not None:
                pred_pseudo = disc_apply(
                    jnp.concatenate([src_img, pseudo_real], axis=1), cond)
                d_real = 0.5 * (d_real + gan_loss(pred_pseudo, True,
                                                  self.use_lsgan))
        if parts in ("all", "g"):
            pred_fake = disc_apply(
                jnp.concatenate([src_img, fake_img], axis=1),
                jax.lax.stop_gradient(cond))
            g_gan = gan_loss(pred_fake, True, self.use_lsgan)
            g_feat = (feature_matching_loss(pred_fake, pred_real,
                                            self.n_layers, self.num_D,
                                            self.lambda_feat)
                      if self.use_gan_feat else z)
            g_vgg = (self.perceptual_fn(fake_img, trg_img) * self.lambda_feat
                     if self.perceptual_fn is not None else z)
        return {"G_GAN": g_gan, "G_GAN_Feat": g_feat, "G_VGG": g_vgg,
                "D_real": d_real, "D_fake": d_fake}


def disc_score(disc_apply, img1, img2, cond) -> jax.Array:
    """Scalar realism score for the planner's 'seq2seqGAN-disc' distance
    (reference seq2seqGANDisc.py:71-80, beam_search.py:190-193):
    1 - sigmoid(mean patch logit)."""
    preds = disc_apply(jnp.concatenate([img1, img2], axis=1), cond)
    score = jnp.mean(jnp.stack([p[-1].mean() for p in preds]))
    return 1.0 - jax.nn.sigmoid(score)


def disc_dists(disc_apply, img1, img2, cond) -> jax.Array:
    """Per-sample disc_score: (B,) of 1 - sigmoid(mean patch logit),
    batched for the planner's candidate ranking."""
    preds = disc_apply(jnp.concatenate([img1, img2], axis=1), cond)
    per = [p[-1].mean(axis=tuple(range(1, p[-1].ndim))) for p in preds]
    return 1.0 - jax.nn.sigmoid(jnp.stack(per).mean(axis=0))


def make_disc_planner_score(disc_apply):
    """Build the planner score_fn for dist_type 'seq2seqGAN-disc'
    (planner.fit.fit_op_params_scored): candidates are scored by how real
    the (source, edited) pair looks to a trained text-conditioned
    discriminator, not by pixel distance to a target (reference
    beam_search.py:226-236).

    Call this ONCE per planning run and reuse the returned function — it
    is a static jit argument downstream.

    :param disc_apply: (x6 (B,6,H,W), cond (B,512)) -> multiscale preds;
        bind the discriminator variables before passing (e.g.
        DiscBundle.disc_apply(params, batch_stats, train=False)).
    :return: score_fn(outs (N,C,3,H,W), (I0 (N,3,H,W), cond (N,512)))
        -> (N, C) distances in [0, 1].

    Deliberate deviation: the reference fits each candidate's params by
    editing the ORIGINAL image I_0 but then applies them to the current
    beam image (beam_search.py:224-230) — the fitted objective and the
    applied edit disagree after step 0. Here the fit optimizes the score
    of the image the edit is actually applied to.
    """
    def score_fn(outs, aux):
        i0, cond = aux
        n, c = outs.shape[:2]
        h, w = outs.shape[-2:]
        i0_b = jnp.broadcast_to(i0[:, None], (n, c, 3, h, w))
        cond_b = jnp.broadcast_to(cond[:, None], (n, c, cond.shape[-1]))
        d = disc_dists(disc_apply,
                       i0_b.reshape(n * c, 3, h, w),
                       outs.reshape(n * c, 3, h, w),
                       cond_b.reshape(n * c, -1))
        return d.reshape(n, c)

    return score_fn
