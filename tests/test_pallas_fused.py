"""Fused Pallas chain kernel vs the jnp operator bank (interpret mode on
CPU; the same comparison runs on real TPU in bench/verify flows)."""

import pytest
import numpy as np
import jax.numpy as jnp

from t2onet_tpu.ops import bank
from t2onet_tpu.ops.pallas_fused import fused_chain, vocab_ops_to_slots


def _workload(b=3, k=4, h=32, w=128, seed=0):
    rng = np.random.default_rng(seed)
    imgs = jnp.asarray(rng.uniform(0, 1, (b, 3, h, w)).astype(np.float32))
    ids = jnp.asarray(rng.choice([2, 3, 4, 5, 6, 8, 9], size=(b, k))
                      .astype(np.int32))
    params = jnp.asarray(rng.uniform(0.1, 0.6, (b, k, 24)).astype(np.float32))
    return imgs, ids, params


def test_fused_chain_matches_bank():
    imgs, ids, params = _workload()
    expect = imgs
    for k in range(ids.shape[1]):
        expect, _ = bank.execute_bank(expect, ids[:, k], params[:, k])
    out = fused_chain(imgs, vocab_ops_to_slots(ids), params, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


def test_fused_chain_masked_matches_bank():
    imgs, ids, params = _workload(seed=2)
    b, _, h, w = imgs.shape
    rng = np.random.default_rng(3)
    # fractional mask values exercise the reference's blend-THEN-clamp
    # order (operators.py:129-130), which differs from pre-clipped
    # blending wherever an op overshoots [0,1]
    mask = rng.uniform(0, 1, (b, 1, h, w)).astype(np.float32)
    mask[:, :, :4] = 0.0
    mask = jnp.asarray(mask)
    expect = imgs
    for k in range(ids.shape[1]):
        expect, _ = bank.execute_bank(expect, ids[:, k], params[:, k],
                                      mask=mask)
    out = fused_chain(imgs, vocab_ops_to_slots(ids), params, mask=mask,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)
    # mask=0 region must stay the input
    keep = np.asarray(mask)[:, 0] == 0.0
    np.testing.assert_allclose(
        np.asarray(out)[:, 0][keep], np.asarray(imgs)[:, 0][keep], atol=1e-6)


def test_fused_chain_masked_identity_tokens():
    imgs, ids, params = _workload(seed=4)
    b, _, h, w = imgs.shape
    mask = jnp.ones((b, 1, h, w), jnp.float32) * 0.7
    ids = jnp.zeros_like(ids)                       # all <NONE> -> identity
    out = fused_chain(imgs, vocab_ops_to_slots(ids), params, mask=mask,
                      interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))


def test_fused_chain_identity_tokens():
    imgs, ids, params = _workload(seed=1)
    ids = jnp.zeros_like(ids)                       # all <NONE> -> identity
    out = fused_chain(imgs, vocab_ops_to_slots(ids), params, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-6)


def test_fused_chain_sharded_matches_single(rng=None):
    import jax

    from t2onet_tpu.parallel.mesh import make_mesh
    from t2onet_tpu.ops.pallas_fused import fused_chain_sharded

    imgs, ids, params = _workload(b=8, seed=5)
    mesh = make_mesh(n_devices=8)
    single = fused_chain(imgs, vocab_ops_to_slots(ids), params,
                         interpret=True)
    sharded = fused_chain_sharded(imgs, vocab_ops_to_slots(ids), params,
                                  mesh, interpret=True)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=1e-6)
    # masked variant shards too
    b, _, h, w = imgs.shape
    mask = jnp.ones((b, 1, h, w), jnp.float32) * 0.5
    sm = fused_chain_sharded(imgs, vocab_ops_to_slots(ids), params, mesh,
                             mask=mask, interpret=True)
    s1 = fused_chain(imgs, vocab_ops_to_slots(ids), params, mask=mask,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(s1), atol=1e-6)


def test_fused_step_grads_match_bank():
    """fused_step's custom VJP (Pallas backward, selected branch only)
    must produce the SAME gradients as differentiating the one-hot bank
    — for the image input and the chosen parameter rows, masked and not.
    Verified to ~1e-9 on real TPU; interpret mode here."""
    import jax

    rng = np.random.default_rng(7)
    b, h, w = 11, 8, 8
    imgs = jnp.asarray(rng.uniform(0, 1, (b, 3, h, w)).astype(np.float32))
    # one of each vocab id 0..10: specials + all 8 executor ops
    ids = jnp.asarray((np.arange(b) % 11).astype(np.int32))
    params = jnp.asarray(rng.uniform(0.05, 0.5, (b, 24)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (b, 3, h, w)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(0, 1, (b, 1, h, w)) > 0.4)
                       .astype(np.float32))

    from t2onet_tpu.ops.pallas_fused import fused_step

    for m in (None, mask):
        def loss_bank(img, p):
            out, _ = bank.execute_bank(img, ids, p, mask=m)
            return jnp.abs(out - gt).mean()

        def loss_fused(img, p):
            out = fused_step(img, vocab_ops_to_slots(ids[:, None])[:, 0],
                             p, mask=m)
            return jnp.abs(out - gt).mean()

        l1, (gi1, gp1) = jax.value_and_grad(loss_bank, (0, 1))(imgs, params)
        l2, (gi2, gp2) = jax.value_and_grad(loss_fused, (0, 1))(imgs, params)
        assert abs(float(l1) - float(l2)) < 1e-6
        np.testing.assert_allclose(np.asarray(gi2), np.asarray(gi1),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(gp2), np.asarray(gp1),
                                   atol=1e-6)
        # param grad lands ONLY on each sample's selected op row
        assert float(jnp.abs(gp2[np.asarray(ids) < 3]).max()) == 0.0


@pytest.mark.slow
def test_episode_step_pallas_exec_trains():
    """make_episode_step(pallas_exec=True) must run and update params
    through the fused-step custom VJP (interpret mode on CPU)."""
    import jax

    from t2onet_tpu.config import ModelConfig, OperatorConfig
    from t2onet_tpu.data.synthetic import synthetic_vocab
    from t2onet_tpu.models.actor import Actor
    from t2onet_tpu.train.loop import create_train_state, make_episode_step

    vocab = synthetic_vocab()
    from tests.conftest import tiny_model_config

    actor = Actor(cfg=tiny_model_config(encoder_max_len=8, decoder_max_len=3),
                  opcfg=OperatorConfig(), vocab_size=len(vocab))
    x = jnp.zeros((2, 8), jnp.int32).at[:, 0].set(1)
    img = jnp.full((2, 3, 8, 8), 0.4)      # interpret mode: py-eval per step
    state = create_train_state(actor, jax.random.PRNGKey(0), x, img)
    step = make_episode_step(actor, donate=False, pallas_exec=True)
    batch = {"x": x, "img_x": img, "gt_img": jnp.full((2, 3, 8, 8), 0.6)}
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["L1_loss"]))
    changed = any(
        bool(jnp.any(a != b))
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(new_state.params)))
    assert changed


def test_vocab_ops_to_slots():
    ids = jnp.asarray([[0, 1, 2, 3, 10]])
    slots = np.asarray(vocab_ops_to_slots(ids))
    np.testing.assert_array_equal(slots, [[0, 0, 0, 1, 8]])
