"""GAN component tests: discriminator shapes, losses, one G/D update."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2onet_tpu.models.gan import (
    ConditionEncoding,
    MultiscaleDiscriminator,
    Seq2SeqGANLosses,
    disc_score,
    feature_matching_loss,
    gan_loss,
)

B, H = 2, 32


@pytest.fixture(scope="module")
def disc_and_vars():
    disc = MultiscaleDiscriminator(num_D=2, n_layers=3, ndf=16)
    x = jnp.zeros((B, 6, H, H))
    cond = jnp.zeros((B, 512))
    v = disc.init(jax.random.PRNGKey(0), x, cond)
    return disc, v


def test_discriminator_shapes(disc_and_vars):
    disc, v = disc_and_vars
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 6, H, H))
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, 512))
    out = disc.apply(v, x, cond, train=False)
    assert len(out) == 2                       # two scales
    for scale in out:
        assert len(scale) == 6                 # n_layers+3 feature maps
        assert scale[-1].shape[-1] == 1        # patch logits
    # second scale operates on a 2x-downsampled input
    assert out[1][-1].shape[1] < out[0][-1].shape[1]


def test_cond_encoding_shape():
    ce = ConditionEncoding(cond_nc=512)
    hid = jnp.zeros((2, B, 512))               # (layers, B, 2H)
    v = ce.init(jax.random.PRNGKey(0), hid)
    out, _ = ce.apply(v, hid, train=True, mutable=["batch_stats"])
    assert out.shape == (B, 512)


def test_gan_and_feature_losses(disc_and_vars):
    disc, v = disc_and_vars
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 6, H, H))
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, 512))
    out = disc.apply(v, x, cond, train=False)
    lr = float(gan_loss(out, True))
    lf = float(gan_loss(out, False))
    assert np.isfinite(lr) and np.isfinite(lf)
    fm = float(feature_matching_loss(out, out, n_layers=3, num_D=2))
    assert fm == pytest.approx(0.0, abs=1e-7)  # identical feats -> 0
    s = float(disc_score(lambda a, c: disc.apply(v, a, c, train=False),
                         x[:, :3], x[:, 3:], cond))
    assert 0.0 <= s <= 1.0


@pytest.mark.slow
def test_seq2seq_gan_losses_grads(disc_and_vars):
    disc, v = disc_and_vars
    losses = Seq2SeqGANLosses(n_layers=3, num_D=2)
    src = jax.random.uniform(jax.random.PRNGKey(3), (B, 3, H, H))
    trg = jnp.clip(src + 0.1, 0, 1)
    cond = jax.random.normal(jax.random.PRNGKey(4), (B, 512))

    def apply_fn(x6, c):
        return disc.apply(v, x6, c, train=False)

    def g_loss(fake):
        ld = losses(apply_fn, src, fake, trg, cond)
        return ld["G_GAN"] + ld["G_GAN_Feat"]

    g = jax.grad(g_loss)(jnp.clip(src * 1.1, 0, 1))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0         # grads reach the fake image

    def d_loss(params):
        def f(x6, c):
            return disc.apply({"params": params,
                               "batch_stats": v["batch_stats"]},
                              x6, c, train=False)
        ld = losses(f, src, jnp.clip(src * 1.1, 0, 1), trg, cond)
        return 0.5 * (ld["D_fake"] + ld["D_real"])

    gd = jax.grad(d_loss)(v["params"])
    total = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(gd))
    assert np.isfinite(total) and total > 0


def test_adapt_gan_pseudo_real(disc_and_vars):
    disc, v = disc_and_vars
    losses = Seq2SeqGANLosses(n_layers=3, num_D=2)
    src = jax.random.uniform(jax.random.PRNGKey(5), (B, 3, H, H))

    def apply_fn(x6, c):
        return disc.apply(v, x6, c, train=False)

    cond = jnp.zeros((B, 512))
    base = losses(apply_fn, src, src, src, cond)
    adapt = losses(apply_fn, src, src, src, cond, pseudo_real=src)
    # pseudo-real averages into D_real (seq2seqAdaptGAN.py:85-111)
    assert float(adapt["D_real"]) == pytest.approx(float(base["D_real"]),
                                                   rel=1e-5)
