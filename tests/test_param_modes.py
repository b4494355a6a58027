"""Parameter-head modes: exploration noise (reference has_noise,
operators.py:57-60, 113-121) and the discrete classification mode
(discrete_param / discrete_step, operators.py:50-54, 146-175)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from t2onet_tpu.config import ModelConfig, OperatorConfig
from t2onet_tpu.ops import bank
from t2onet_tpu.ops import operators as O


CFG = OperatorConfig()


def test_param_ranges_reference_values():
    ub, lb, init = bank.param_ranges(CFG)
    # brightness +-2 init 0 (operators.py:288-291)
    assert ub[0] == 2.0 and lb[0] == -2.0 and init[0] == 0.0
    # saturation [-0.2, 0.8] init 0 (operators.py:484-487)
    assert np.isclose(ub[2], 0.8) and np.isclose(lb[2], -0.2)
    # tone (0.5, 2) init mid (operators.py:587-590)
    assert np.isclose(init[5], 1.25)
    # sharpness (0, 1.5) init ub/2 (operators.py:363-366)
    assert np.isclose(init[6], 0.75)


def test_add_param_noise_in_range_and_padding_zero():
    rng = jax.random.PRNGKey(0)
    params = jnp.zeros((16, bank.N_OPS, bank.MAX_PARAM))
    out = np.asarray(bank.add_param_noise(params, rng, CFG, factor=0.6))
    ub, lb, _ = bank.param_ranges(CFG)
    for i in range(bank.N_OPS):
        k = O.PARAM_COUNTS[i]
        assert (out[:, i, :k] >= lb[i] - 1e-6).all()
        assert (out[:, i, :k] <= ub[i] + 1e-6).all()
        assert (out[:, i, k:] == 0).all()           # padding untouched
    # noise actually moves the params somewhere — in BOTH directions (the
    # reference's operators.py:59 adds both relu terms, making its noise
    # one-sided; see bank.add_param_noise docstring)
    assert out[:, 0, 0].max() > 1e-3
    assert out[:, 0, 0].min() < -1e-3
    # inpaint's range is (0, 0): always clamped back to zero
    assert (out[:, 4, :] == 0).all()


def test_add_param_noise_deterministic_by_key():
    params = jnp.full((4, bank.N_OPS, bank.MAX_PARAM), 0.1)
    a = bank.add_param_noise(params, jax.random.PRNGKey(1), CFG)
    b = bank.add_param_noise(params, jax.random.PRNGKey(1), CFG)
    c = bank.add_param_noise(params, jax.random.PRNGKey(2), CFG)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


def test_discrete_param_grid_reference_rule():
    grid, supported = bank.discrete_param_grid(CFG, num=10)
    # symmetric range (brightness): linspace(-2, 2, 11) minus the 0 middle
    assert supported[0]
    expect = np.delete(np.linspace(-2, 2, 11), 5)
    np.testing.assert_allclose(grid[0], expect, atol=1e-6)
    assert 0.0 not in grid[0]
    # zero-start range (white): linspace(0, 1, 11) minus the 0
    assert supported[7]
    np.testing.assert_allclose(grid[7], np.linspace(0.1, 1.0, 10), atol=1e-6)
    # saturation's asymmetric range fits neither discretize case
    assert not supported[2]
    # curve ops have no classifier in the reference
    assert not supported[3] and not supported[5]
    assert not supported[4]                          # inpaint (0,0) range


def test_select_discrete_params_argmax_and_fallback():
    num = 10
    b = 3
    raw = jnp.asarray(np.random.default_rng(0).normal(
        size=(b, bank.N_OPS, bank.MAX_PARAM)).astype(np.float32))
    cont = bank.squash_params(raw, CFG)
    params, logp = bank.select_discrete_params(raw, cont, None, False,
                                               0.05, CFG, num)
    grid, supported = bank.discrete_param_grid(CFG, num)
    p = np.asarray(params)
    ind = np.argmax(np.asarray(raw)[:, :, :num], axis=-1)
    for i in range(bank.N_OPS):
        if supported[i]:
            np.testing.assert_allclose(p[:, i, 0], grid[i][ind[:, i]],
                                       atol=1e-6)
            assert (p[:, i, 1:] == 0).all()
        else:
            np.testing.assert_allclose(p[:, i], np.asarray(cont)[:, i])
    # log-probs normalized
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0,
                               atol=1e-5)


def test_select_discrete_params_sampling_explores():
    num = 10
    raw = jnp.zeros((64, bank.N_OPS, bank.MAX_PARAM))   # uniform logits
    cont = jnp.zeros((64, bank.N_OPS, bank.MAX_PARAM))
    params, _ = bank.select_discrete_params(raw, cont, jax.random.PRNGKey(0),
                                            True, 0.05, CFG, num)
    vals = np.asarray(params)[:, 0, 0]                  # brightness bins
    assert len(np.unique(vals)) > 3                     # spread over bins


def _tiny_actor(discrete=False):
    from t2onet_tpu.data.synthetic import SyntheticFiveK, synthetic_vocab
    from t2onet_tpu.models.actor import Actor

    vocab = synthetic_vocab()
    from tests.conftest import tiny_model_config

    cfg = tiny_model_config(encoder_max_len=8, decoder_max_len=3,
                            discrete_param=discrete)
    actor = Actor(cfg=cfg, opcfg=CFG, vocab_size=len(vocab))
    ds = SyntheticFiveK(n=2, img_size=16, seed=0, req_max_len=8)
    b = next(ds.batches(batch_size=2, steps=1, shuffle=False))
    x = jnp.asarray(b["x"])
    img = jnp.asarray(b["img_x"])
    variables = actor.init({"params": jax.random.PRNGKey(0)}, x, img)
    return actor, variables, x, img


def test_episode_discrete_params_on_grid():
    from t2onet_tpu.models.actor import Actor

    actor, variables, x, img = _tiny_actor(discrete=True)
    out = actor.apply(variables, x, img, rng=jax.random.PRNGKey(1),
                      sample=True, method=Actor.episode)
    grid, supported = bank.discrete_param_grid(CFG, 10)
    ops = np.asarray(out["ops"])
    params = np.asarray(out["params"])
    assert np.isfinite(params).all()
    for bi in range(ops.shape[0]):
        for s in range(ops.shape[1]):
            ei = ops[bi, s] - 3
            if 0 <= ei < bank.N_OPS and supported[ei]:
                assert np.any(np.isclose(grid[ei], params[bi, s, 0],
                                         atol=1e-5)), (ei, params[bi, s, 0])


def test_episode_param_noise_runs_in_range():
    from t2onet_tpu.models.actor import Actor

    actor, variables, x, img = _tiny_actor()
    out = actor.apply(variables, x, img, rng=jax.random.PRNGKey(1),
                      sample=True, param_noise=0.6, method=Actor.episode)
    clean = actor.apply(variables, x, img, rng=jax.random.PRNGKey(1),
                        sample=True, param_noise=0.0, method=Actor.episode)
    assert np.isfinite(np.asarray(out["imgs"])).all()
    ub, lb, _ = bank.param_ranges(CFG)
    params = np.asarray(out["params"])                 # chosen (B,S,24)
    # scalar slot stays within the widest op range
    assert params[..., 0].max() <= ub.max() + 1e-5
    assert params[..., 0].min() >= lb.min() - 1e-5
    # noise changed something vs the clean rollout
    assert np.abs(params - np.asarray(clean["params"])).max() > 1e-5


def test_gt_param_bins_nearest():
    bins, sup = bank.gt_param_bins(
        jnp.asarray([0.45, -1.9, 0.0]), jnp.asarray([0, 0, -3]), CFG, 10)
    grid, _ = bank.discrete_param_grid(CFG, 10)
    assert np.isclose(grid[0][int(bins[0])], 0.4)   # nearest to 0.45
    assert np.isclose(grid[0][int(bins[1])], -2.0)  # nearest to -1.9
    assert bool(sup[0]) and bool(sup[1])
    assert not bool(sup[2])                         # special token


@pytest.mark.slow
def test_discrete_supervised_step_trains_heads():
    """--discrete_param training must move the bin logits (the reference's
    discrete mode has no gradient path; ours adds a bin cross-entropy)."""
    import jax.numpy as jnp

    from t2onet_tpu.models.actor import Actor
    from t2onet_tpu.train.loop import (create_train_state,
                                       make_supervised_step,
                                       discrete_param_loss)

    actor, variables, x, img = _tiny_actor(discrete=True)
    state = create_train_state(actor, jax.random.PRNGKey(0), x, img)
    t = 4
    b = x.shape[0]
    batch = {
        "x": x,
        "y": jnp.tile(jnp.asarray([[1, 3, 4, 2]], jnp.int32), (b, 1)),
        "img_x": img,
        "img_y": jnp.repeat(img[:, None], t - 1, axis=1),
        "gt_params": jnp.zeros((b, t - 2, 24)).at[:, 0, 0].set(0.4)
                                              .at[:, 1, 0].set(-0.6),
    }
    # supervised returns the bin log-probs as a 4th element
    out = actor.apply(variables, batch["x"], batch["y"], batch["img_x"],
                      batch["img_y"], train=False, method=Actor.supervised)
    assert len(out) == 4
    ce0 = float(discrete_param_loss(out[3], batch["y"], batch["gt_params"],
                                    CFG, 10))
    assert np.isfinite(ce0) and ce0 > 0

    step = make_supervised_step(actor, donate=False)
    w2_before = np.asarray(state.params["heads"]["w2"])
    for _ in range(8):
        state, m = step(state, batch)
    w2_after = np.asarray(state.params["heads"]["w2"])
    # brightness (op 0) is discrete-capable: its head weights must move
    assert np.abs(w2_after[0] - w2_before[0]).max() > 1e-6
    out2 = actor.apply({"params": state.params,
                        "batch_stats": state.batch_stats},
                       batch["x"], batch["y"], batch["img_x"],
                       batch["img_y"], train=False, method=Actor.supervised)
    ce1 = float(discrete_param_loss(out2[3], batch["y"], batch["gt_params"],
                                    CFG, 10))
    assert ce1 < ce0                      # the bin CE actually decreases


def test_disc_planner_score_candidate_independent():
    """Eval-mode disc scoring: a candidate's score must not depend on the
    other candidates in the fitting batch (train-mode BN would couple
    them)."""
    from t2onet_tpu.models.gan import (MultiscaleDiscriminator,
                                       make_disc_planner_score)

    disc = MultiscaleDiscriminator(ndf=4, n_layers=2, num_D=2)
    v = disc.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 16, 16)),
                  jnp.zeros((1, 512)))

    def disc_apply(x6, cond):
        return disc.apply(v, x6, cond, train=False)

    score_fn = make_disc_planner_score(disc_apply)
    rng = np.random.default_rng(0)
    outs = jnp.asarray(rng.uniform(0, 1, (1, 3, 3, 16, 16)).astype(np.float32))
    i0 = jnp.asarray(rng.uniform(0, 1, (1, 3, 16, 16)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(1, 512)).astype(np.float32))
    together = np.asarray(score_fn(outs, (i0, cond)))
    alone = [float(score_fn(outs[:, k:k + 1], (i0, cond))[0, 0])
             for k in range(3)]
    np.testing.assert_allclose(together[0], alone, atol=1e-6)
