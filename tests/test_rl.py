"""RL fine-tuning losses and step (train/rl.py; the reference ships the
RL machinery but not the training loop — SURVEY.md §5.6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2onet_tpu.config import ModelConfig, OperatorConfig
from t2onet_tpu.models.actor import Actor
from t2onet_tpu.train.loop import create_train_state
from t2onet_tpu.train.rl import make_rl_step, rl_losses

B, L, HW = 4, 9, 16


@pytest.fixture(scope="module")
def setup():
    from tests.conftest import tiny_model_config

    cfg = tiny_model_config(encoder_max_len=L, decoder_max_len=3)
    actor = Actor(cfg=cfg, opcfg=OperatorConfig(), vocab_size=30)
    x = jnp.asarray(np.tile([[1, 5, 6, 2, 0, 0, 0, 0, 0]], (B, 1)),
                    jnp.int32)
    img = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, HW, HW),
                             minval=0.2, maxval=0.8)
    state = create_train_state(actor, jax.random.PRNGKey(0), x, img)
    return actor, state, x, img


def test_rl_losses_math():
    s, n_cls = 3, 11
    ops = jnp.asarray([[3, 2, 0],       # END at step 1 -> steps 0,1 count
                       [4, 5, 9]])      # no END -> all steps count
    # sample 0: uniform logprobs; sample 1: its chosen ops carry a
    # DIFFERENT logprob so the normalized-advantage pg term is
    # non-degenerate (symmetric advantages with equal per-step logprob
    # means cancel exactly)
    logprobs = jnp.log(jnp.full((2, s, n_cls), 1.0 / n_cls))
    lp1 = float(np.log(0.5))
    logprobs = logprobs.at[1, 0, 4].set(lp1).at[1, 1, 5].set(lp1) \
                       .at[1, 2, 9].set(lp1)
    imgs = jnp.stack([jnp.full((s, 3, 4, 4), 0.5)] * 2)
    gt = jnp.stack([jnp.full((3, 4, 4), 0.5),       # perfect -> reward 0
                    jnp.full((3, 4, 4), 0.9)])      # off by .4
    total, m = rl_losses({"imgs": imgs, "ops": ops, "logprobs": logprobs},
                         gt, entropy_factor=0.05)
    np.testing.assert_allclose(float(m["rl_l1"]), 0.2, atol=1e-6)
    np.testing.assert_allclose(float(m["rl_reward"]), -0.2, atol=1e-6)
    # sample 0's policy is uniform -> zero entropy penalty rows; sample
    # 1's edited rows are deliberately unnormalized, so its penalty is
    # merely nonzero (sign is meaningless for a non-distribution)
    assert float(m["rl_entropy"]) != 0.0 and np.isfinite(float(m["rl_entropy"]))
    # rewards (0, -0.4): mean -0.2, std 0.2 -> normalized adv (+1, -1);
    # per-sample step-MEAN of chosen logprobs, 2 counted steps for
    # sample 0 (END at step 1), 3 for sample 1
    lp0 = float(jnp.log(1.0 / n_cls))
    expect_pg = -0.5 * (1.0 * (2 * lp0) / 2 + (-1.0) * (3 * lp1) / 3)
    # atol covers the 1e-4 spread regularizer's ~5e-4 shift on adv=±1
    np.testing.assert_allclose(float(m["rl_pg"]), expect_pg, atol=2e-3)


def test_rl_step_runs_and_updates(setup):
    actor, state, x, img = setup
    step = make_rl_step(actor, donate=False)   # state is reused below
    batch = {"x": x, "img_x": img,
             "gt_img": jnp.clip(img * 1.2, 0, 1)}
    new_state, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["rl_loss"]))
    assert np.isfinite(float(m["rl_pg"]))
    assert float(m["rl_entropy"]) >= 0.0
    # parameters actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params,
        new_state.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0

    # deterministic under a fixed rng (same compiled step, same inputs;
    # rebuilding the step would only re-pay a full retrace)
    again, m2 = step(state, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m2["rl_loss"]), float(m["rl_loss"]),
                               rtol=1e-6)


@pytest.mark.slow
def test_rl_step_sharded(setup):
    from t2onet_tpu.parallel.mesh import make_mesh, shard_batch

    actor, state, x, img = setup
    mesh = make_mesh(n_devices=4)
    step = make_rl_step(actor, mesh=mesh, donate=False)
    batch = shard_batch({"x": x, "img_x": img,
                         "gt_img": jnp.clip(img * 1.2, 0, 1)}, mesh)
    _, m = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["rl_loss"]))
