"""First-party inpainting backend (the inpaint operator slot; reference
InpaintOperator delegates to external EdgeConnect, operators.py:625-682)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from t2onet_tpu.models.inpaint import (
    InpaintNet, compose, inpaint_loss, load_inpaint, make_inpaint_fn,
    make_train_step, random_freeform_masks, save_inpaint)


@pytest.fixture(scope="module")
def tiny():
    net = InpaintNet(features=4, dilations=(2, 2))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (2, 3, 16, 16)).astype(np.float32))
    mask = jnp.asarray(random_freeform_masks(rng, 2, 16, 16))
    params = net.init(jax.random.PRNGKey(0), img, mask)
    return net, params, img, mask


def test_forward_shape_and_range(tiny):
    net, params, img, mask = tiny
    pred = net.apply(params, img, mask)
    assert pred.shape == img.shape
    assert float(pred.min()) >= 0.0 and float(pred.max()) <= 1.0


def test_compose_preserves_valid_region(tiny):
    net, params, img, mask = tiny
    out = compose(net.apply(params, img, mask), img, mask)
    valid = np.asarray(mask)[:, 0] == 0.0
    np.testing.assert_array_equal(
        np.asarray(out)[:, 0][valid], np.asarray(img)[:, 0][valid])


def test_training_reduces_loss(tiny):
    net, params, img, mask = tiny
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = make_train_step(net, tx)
    _, _, first = step(params, opt_state, img, mask)
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, img, mask)
    assert float(loss) < float(first)


def test_masks_are_binary_and_nonempty():
    rng = np.random.default_rng(1)
    m = random_freeform_masks(rng, 4, 32, 32)
    assert m.shape == (4, 1, 32, 32)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    assert all(m[b].sum() > 0 for b in range(4))


def test_inpaint_fn_plugs_into_bank(tiny):
    from t2onet_tpu.ops import bank

    net, params, img, mask = tiny
    fn = make_inpaint_fn(net, params, mask)
    # vocab id 7 = inpaint_obj -> executor op 4
    ids = jnp.full((img.shape[0],), 7, jnp.int32)
    out, chosen = bank.execute_bank(img, ids, jnp.zeros((img.shape[0], 24)),
                                    mask=mask, inpaint_fn=fn)
    assert out.shape == img.shape
    np.testing.assert_array_equal(np.asarray(chosen), 0.0)
    valid = np.asarray(mask)[:, 0] == 0.0
    np.testing.assert_allclose(
        np.asarray(out)[:, 0][valid], np.asarray(img)[:, 0][valid], atol=1e-6)
    # the hole must actually change (net output, not passthrough)
    hole = np.asarray(mask)[:, 0] == 1.0
    assert np.abs(np.asarray(out)[:, 0][hole]
                  - np.asarray(img)[:, 0][hole]).max() > 1e-4


def test_save_load_roundtrip(tiny, tmp_path):
    net, params, img, mask = tiny
    save_inpaint(str(tmp_path / "ck"), net, params)
    net2, params2 = load_inpaint(str(tmp_path / "ck"))
    np.testing.assert_allclose(
        np.asarray(net2.apply(params2, img, mask)),
        np.asarray(net.apply(params, img, mask)), atol=0)
