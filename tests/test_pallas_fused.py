"""Fused Pallas chain kernel vs the jnp operator bank (interpret mode on
CPU; the same comparison runs on real TPU in bench/verify flows)."""

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


def test_vocab_ops_to_slots():
    ids = jnp.asarray([[0, 1, 2, 3, 10]])
    slots = np.asarray(vocab_ops_to_slots(ids))
    np.testing.assert_array_equal(slots, [[0, 0, 0, 1, 8]])
