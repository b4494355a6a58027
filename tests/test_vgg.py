"""VGG19 perceptual network + VGGLoss vs a plain-torch oracle.

Reference spec: models/seq2seqGAN/networks.py:427-461 (five slices of
torchvision vgg19.features with ImageNet normalization) and 113-125
(weighted L1 VGGLoss). torchvision is absent here, so the oracle
reimplements the slice math in plain torch with random weights shared
through convert_torchvision_vgg19.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from t2onet_tpu.models.vgg import (  # noqa: E402
    VGG_LOSS_WEIGHTS, Vgg19Features, convert_torchvision_vgg19,
    make_vgg_loss)

_CONVS = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
          (10, 128, 256), (12, 256, 256), (14, 256, 256), (16, 256, 256),
          (19, 256, 512), (21, 512, 512), (23, 512, 512), (25, 512, 512),
          (28, 512, 512)]
_POOLS = {4, 9, 18, 27}
_SLICE_ENDS = (2, 7, 12, 21, 30)


def _random_sd(rng, scale=0.05):
    sd = {}
    for idx, cin, cout in _CONVS:
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * scale)
        sd[f"features.{idx}.bias"] = torch.from_numpy(
            rng.standard_normal(cout).astype(np.float32) * scale)
    # classifier entries must be ignored by the converter
    sd["classifier.0.weight"] = torch.zeros(2, 2)
    return sd


def _torch_vgg_slices(sd, x01):
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = (x01 - mean) / std
    outs = []
    ends = iter(_SLICE_ENDS)
    nxt = next(ends)
    conv_idx = {i for i, _, _ in _CONVS}
    for idx in range(30):
        if idx in conv_idx:
            x = F.conv2d(x, sd[f"features.{idx}.weight"],
                         sd[f"features.{idx}.bias"], padding=1)
        elif idx in _POOLS:
            x = F.max_pool2d(x, 2, 2)
        else:
            x = F.relu(x)
        if idx + 1 == nxt:
            outs.append(x)
            nxt = next(ends, None)
    return outs


def test_vgg19_slices_match_torch_oracle():
    rng = np.random.default_rng(0)
    sd = _random_sd(rng)
    x = rng.uniform(0, 1, (2, 3, 48, 48)).astype(np.float32)

    with torch.no_grad():
        ref = _torch_vgg_slices(sd, torch.from_numpy(x))

    variables = convert_torchvision_vgg19(sd)
    outs = Vgg19Features().apply(variables, jnp.asarray(x))
    assert len(outs) == len(ref) == 5
    for i, (o, r) in enumerate(zip(outs, ref)):
        assert o.shape == tuple(r.shape), i
        np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=1e-4,
                                   atol=1e-3, err_msg=f"slice {i}")


def test_vgg_loss_matches_torch_oracle_and_grads_flow():
    rng = np.random.default_rng(1)
    sd = _random_sd(rng)
    x = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
    y = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        fx = _torch_vgg_slices(sd, torch.from_numpy(x))
        fy = _torch_vgg_slices(sd, torch.from_numpy(y))
        ref_loss = sum(w * F.l1_loss(a, b)
                       for w, a, b in zip(VGG_LOSS_WEIGHTS, fx, fy))

    variables = convert_torchvision_vgg19(sd)
    loss_fn = make_vgg_loss(variables)
    loss = loss_fn(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    assert float(loss) > 0

    # gradient reaches x; the stop_gradient'ed target contributes none
    gx = jax.grad(lambda a: loss_fn(a, jnp.asarray(y)))(jnp.asarray(x))
    gy = jax.grad(lambda b: loss_fn(jnp.asarray(x), b))(jnp.asarray(y))
    assert float(jnp.abs(gx).max()) > 0
    assert float(jnp.abs(gy).max()) == 0

    # identical inputs -> zero loss
    z = loss_fn(jnp.asarray(x), jnp.asarray(x))
    assert float(z) < 1e-7


def test_gan_losses_nonzero_g_vgg_with_perceptual_fn():
    """Plugging the VGG perceptual fn into the GAN loss assembly yields a
    nonzero G_VGG (reference loss_G = ... + G_VGG, seq2seqGAN.py:89-117)."""
    from t2onet_tpu.models.gan import (MultiscaleDiscriminator,
                                       Seq2SeqGANLosses)

    rng = np.random.default_rng(2)
    sd = _random_sd(rng)
    perceptual_fn = make_vgg_loss(convert_torchvision_vgg19(sd))
    losses = Seq2SeqGANLosses(n_layers=1, num_D=1, lambda_feat=10.0,
                              perceptual_fn=perceptual_fn)
    disc = MultiscaleDiscriminator(num_D=1, n_layers=1, ndf=8)
    img6 = jnp.zeros((1, 6, 32, 32))
    cond = jnp.zeros((1, 512))
    v = disc.init(jax.random.PRNGKey(0), img6, cond)

    def disc_apply(x, c):
        return disc.apply(v, x, c, train=False)

    src = jnp.asarray(rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32))
    fake = jnp.asarray(rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32))
    trg = jnp.asarray(rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32))
    out = losses(disc_apply, src, fake, trg, cond)
    assert float(out["G_VGG"]) > 0
