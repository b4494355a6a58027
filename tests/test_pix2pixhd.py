"""Pix2PixHD generators vs the torch reference (networks.py:130-291).

Builds the reference GlobalGenerator / LocalEnhancer / Encoder with
random weights, converts their state_dicts through convert_pix2pixhd,
and asserts forward parity on identical inputs. Instance norm
(define_G's only call-mode, networks.py:28-35) has no params, so the
conversion is convs only.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference checkout not available")


def _ref_networks():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # networks.py imports torchvision at module level (for its Vgg19,
    # networks.py:426) — not installed here and not needed for the
    # generators; shim the import only
    import types

    tv = types.ModuleType("torchvision")
    tv.models = types.ModuleType("torchvision.models")
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tv.models)
    from models.seq2seqGAN import networks

    return networks


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _parity(ref_mod, flax_mod, x, extra=()):
    import jax
    import jax.numpy as jnp

    from t2onet_tpu.convert.torch_checkpoint import convert_pix2pixhd

    with torch.no_grad():
        want = ref_mod(torch.from_numpy(x), *[torch.from_numpy(e)
                                              for e in extra]).numpy()
    args = (jnp.asarray(x),) + tuple(jnp.asarray(e) for e in extra)
    ref_params = flax_mod.init(jax.random.PRNGKey(0), *args)["params"]
    params = convert_pix2pixhd(_sd(ref_mod), ref_params)
    got = np.asarray(flax_mod.apply({"params": params}, *args))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_global_generator_parity(rng):
    networks = _ref_networks()
    from t2onet_tpu.models.pix2pixhd import GlobalGenerator

    norm = networks.get_norm_layer("instance")
    ref = networks.GlobalGenerator(3, 3, ngf=4, n_downsampling=2,
                                   n_blocks=2, norm_layer=norm).eval()
    ours = GlobalGenerator(output_nc=3, ngf=4, n_downsampling=2, n_blocks=2)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    _parity(ref, ours, x)


def test_local_enhancer_parity(rng):
    networks = _ref_networks()
    from t2onet_tpu.models.pix2pixhd import LocalEnhancer

    norm = networks.get_norm_layer("instance")
    ref = networks.LocalEnhancer(3, 3, ngf=4, n_downsample_global=2,
                                 n_blocks_global=2, n_local_enhancers=1,
                                 n_blocks_local=2, norm_layer=norm).eval()
    ours = LocalEnhancer(output_nc=3, ngf=4, n_downsample_global=2,
                         n_blocks_global=2, n_local_enhancers=1,
                         n_blocks_local=2)
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    _parity(ref, ours, x)


def test_encoder_parity(rng):
    networks = _ref_networks()
    from t2onet_tpu.models.pix2pixhd import Encoder

    norm = networks.get_norm_layer("instance")
    ref = networks.Encoder(3, 3, ngf=4, n_downsampling=2,
                           norm_layer=norm).eval()
    ours = Encoder(output_nc=3, ngf=4, n_downsampling=2, n_instances=4)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    inst = rng.integers(0, 4, (2, 1, 32, 32)).astype(np.float32)
    _parity(ref, ours, x, extra=(inst,))


def test_encoder_arbitrary_instance_ids(rng):
    """Instance ids may be arbitrary integers (cityscapes convention
    class*1000+index, e.g. 26002) — pooling must average per distinct id,
    not silently zero out-of-range ids."""
    import jax
    import jax.numpy as jnp

    from t2onet_tpu.models.pix2pixhd import Encoder

    enc = Encoder(output_nc=3, ngf=4, n_downsampling=1, n_instances=4)
    x = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    inst = np.full((1, 1, 16, 16), 26002, np.float32)
    inst[:, :, :, 8:] = 24001                  # two big distinct ids
    v = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(inst))
    out = np.asarray(enc.apply(v, jnp.asarray(x), jnp.asarray(inst)))
    assert np.abs(out).max() > 0               # not silently zeroed
    # within each instance the pooled feature is constant
    for sl in (np.s_[:, :, :, :8], np.s_[:, :, :, 8:]):
        region = out[sl]
        assert np.allclose(region, region[:, :, :1, :1], atol=1e-6)
    # and the two instances differ
    assert not np.allclose(out[:, :, :, :8].mean(axis=(2, 3)),
                           out[:, :, :, 8:].mean(axis=(2, 3)), atol=1e-7)


def test_define_generator_factory():
    from t2onet_tpu.models.pix2pixhd import (Encoder, GlobalGenerator,
                                             LocalEnhancer,
                                             define_generator)

    assert isinstance(define_generator("global"), GlobalGenerator)
    assert isinstance(define_generator("local"), LocalEnhancer)
    assert isinstance(define_generator("encoder"), Encoder)
    with pytest.raises(ValueError):
        define_generator("nope")
