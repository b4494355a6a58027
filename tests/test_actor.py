"""Shape / jit / semantic tests for the Actor (encoder, decoder, rollouts)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2onet_tpu.config import ModelConfig, OperatorConfig
from t2onet_tpu.models.actor import Actor, select_end_images, EPISODE_OP_MASK
from t2onet_tpu.models.encoder import RNNEncoder

B, L, T, HW = 2, 9, 7, 32
VOCAB = 40


@pytest.fixture(scope="module")
def actor_and_vars():
    from tests.conftest import tiny_model_config

    cfg = tiny_model_config(encoder_max_len=L, decoder_max_len=5)
    actor = Actor(cfg=cfg, opcfg=OperatorConfig(), vocab_size=VOCAB)
    rng = jax.random.PRNGKey(0)
    x = jnp.array([[1, 5, 6, 7, 2, 0, 0, 0, 0],
                   [1, 8, 2, 0, 0, 0, 0, 0, 0]], jnp.int32)
    img = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, HW, HW))
    variables = actor.init({"params": rng}, x, img)
    return actor, variables, x, img


def test_episode_shapes(actor_and_vars):
    actor, variables, x, img = actor_and_vars
    out = actor.apply(variables, x, img, method=Actor.episode)
    assert out["imgs"].shape == (B, 5, 3, HW, HW)
    assert out["ops"].shape == (B, 5)
    assert out["params"].shape == (B, 5, 24)
    assert out["logprobs"].shape == (B, 5, 11)
    assert out["attn"].shape == (B, 5, L)
    assert np.isfinite(np.asarray(out["imgs"])).all()


def test_episode_probe_size(actor_and_vars):
    """probe_size decodes at a reduced view: output images stay at full
    resolution, the rollout is gradient-clean, and probe_size == full
    size reproduces the default path exactly."""
    actor, variables, x, img = actor_and_vars
    out = actor.apply(variables, x, img, probe_size=HW // 2,
                      method=Actor.episode)
    assert out["imgs"].shape == (B, 5, 3, HW, HW)
    assert np.isfinite(np.asarray(out["imgs"])).all()
    # same-size probe is exactly the default path
    ref = actor.apply(variables, x, img, method=Actor.episode)
    same = actor.apply(variables, x, img, probe_size=HW,
                       method=Actor.episode)
    np.testing.assert_allclose(np.asarray(same["imgs"]),
                               np.asarray(ref["imgs"]), atol=0)

    def loss(v):
        o = actor.apply(v, x, img, probe_size=HW // 2,
                        method=Actor.episode)
        return jnp.abs(o["imgs"]).mean()

    g = jax.grad(loss)(variables)
    leaves = jax.tree.leaves(g["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_episode_never_picks_blocked_ops(actor_and_vars):
    """NONE/START/inpaint/color_bg are hard-blocked (reference actor.py:211)."""
    actor, variables, x, img = actor_and_vars
    out = actor.apply(variables, x, img, method=Actor.episode)
    ops = np.asarray(out["ops"])
    blocked = np.where(np.asarray(EPISODE_OP_MASK) == 0)[0]
    assert not np.isin(ops, blocked).any()


def test_episode_no_repeat(actor_and_vars):
    """A chosen op is never chosen again (reference actor.py:235-236)."""
    actor, variables, x, img = actor_and_vars
    out = actor.apply(variables, x, img, method=Actor.episode)
    ops = np.asarray(out["ops"])
    for b in range(B):
        assert len(set(ops[b])) == len(ops[b]), ops[b]


def test_episode_greedy_deterministic_and_jittable(actor_and_vars):
    actor, variables, x, img = actor_and_vars
    f = jax.jit(lambda v, x_, i_: actor.apply(v, x_, i_, method=Actor.episode))
    o1 = f(variables, x, img)
    o2 = actor.apply(variables, x, img, method=Actor.episode)
    np.testing.assert_array_equal(np.asarray(o1["ops"]), np.asarray(o2["ops"]))
    np.testing.assert_allclose(np.asarray(o1["imgs"]), np.asarray(o2["imgs"]),
                               atol=1e-4)


def test_episode_sampling(actor_and_vars):
    actor, variables, x, img = actor_and_vars
    out = actor.apply(variables, x, img, rng=jax.random.PRNGKey(42),
                      sample=True, method=Actor.episode)
    ops = np.asarray(out["ops"])
    blocked = np.where(np.asarray(EPISODE_OP_MASK) == 0)[0]
    assert not np.isin(ops, blocked).any()
    for b in range(B):
        assert len(set(ops[b])) == len(ops[b])


def test_supervised_shapes_and_grads(actor_and_vars):
    actor, variables, x, img = actor_and_vars
    y = jnp.array([[1, 3, 4, 2, 0, 0, 0],
                   [1, 9, 2, 0, 0, 0, 0]], jnp.int32)
    img_y = jnp.tile(img[:, None], (1, T - 1, 1, 1, 1))
    gt_params = jnp.zeros((B, T - 2, 24)).at[:, 0, 0].set(0.5)

    def loss_fn(params):
        v = {**variables, "params": params}
        (pred_imgs, pred_params, logprobs), updates = actor.apply(
            v, x, y, img, img_y, train=True, mutable=["batch_stats"],
            method=Actor.supervised)
        assert pred_imgs is None
        assert pred_params.shape == (B, T - 2, 24)
        assert logprobs.shape == (B, T - 1, 11)
        tgt = jax.nn.one_hot(y[:, 1:], 11)
        nll = -(logprobs * tgt).sum(-1).mean()
        mse = ((pred_params - gt_params) ** 2).sum()
        return nll + mse

    g = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
    # heads must receive gradient through the param loss
    gh = g["heads"]["w2"]
    assert float(jnp.abs(gh).sum()) > 0


def test_supervised_per_step_bn(actor_and_vars):
    """per_step_bn=True (reference-exact BN: stats over the (B,) step batch,
    actor.py:142) must equal the batched default in eval mode (running
    averages — no batch stats involved) and differ in train mode (different
    normalization batches), with different running-average updates."""
    actor, variables, x, img = actor_and_vars
    y = jnp.array([[1, 3, 4, 2, 0, 0, 0],
                   [1, 9, 2, 0, 0, 0, 0]], jnp.int32)
    # distinct per-step teacher images so step batches have distinct stats
    img_y = jnp.stack([jnp.clip(img * (0.6 + 0.1 * i), 0, 1)
                       for i in range(T - 1)], axis=1)

    _, p_eval_a, l_eval_a = actor.apply(
        variables, x, y, img, img_y, train=False, method=Actor.supervised)
    _, p_eval_b, l_eval_b = actor.apply(
        variables, x, y, img, img_y, train=False, per_step_bn=True,
        method=Actor.supervised)
    np.testing.assert_allclose(np.asarray(l_eval_a), np.asarray(l_eval_b),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_eval_a), np.asarray(p_eval_b),
                               atol=1e-6)

    (_, _, l_tr_a), upd_a = actor.apply(
        variables, x, y, img, img_y, train=True, mutable=["batch_stats"],
        method=Actor.supervised)
    (_, _, l_tr_b), upd_b = actor.apply(
        variables, x, y, img, img_y, train=True, per_step_bn=True,
        mutable=["batch_stats"], method=Actor.supervised)
    assert float(jnp.abs(l_tr_a - l_tr_b).max()) > 1e-7
    ra_a = jax.tree_util.tree_leaves(upd_a["batch_stats"])
    ra_b = jax.tree_util.tree_leaves(upd_b["batch_stats"])
    assert any(float(jnp.abs(a - b).max()) > 1e-7
               for a, b in zip(ra_a, ra_b))


def test_supervised_with_images(actor_and_vars):
    actor, variables, x, img = actor_and_vars
    y = jnp.array([[1, 3, 4, 2, 0, 0, 0],
                   [1, 9, 2, 0, 0, 0, 0]], jnp.int32)
    img_y = jnp.tile(img[:, None], (1, T - 1, 1, 1, 1))
    pred_imgs, pred_params, logprobs = actor.apply(
        variables, x, y, img, img_y, train=False, with_images=True,
        method=Actor.supervised)
    assert pred_imgs.shape == (B, T - 2, 3, HW, HW)
    assert np.isfinite(np.asarray(pred_imgs)).all()


def test_select_end_images():
    imgs = jnp.arange(2 * 3 * 1 * 1 * 1, dtype=jnp.float32).reshape(2, 3, 1, 1, 1)
    ops = jnp.array([[4, 2, 5], [4, 5, 6]])   # END at idx 1 / no END
    out = select_end_images(imgs, ops, end_id=2)
    assert float(out[0, 0, 0, 0]) == 1.0      # first END position
    assert float(out[1, 0, 0, 0]) == 5.0      # last step fallback


def test_encoder_masking():
    """Outputs zero past length; final carry = state at true last token."""
    enc = RNNEncoder(vocab_size=VOCAB, hidden_size=8, n_layers=2,
                     word_vec_dim=16)
    x_long = jnp.array([[1, 5, 6, 2, 0, 0]], jnp.int32)
    x_short = jnp.array([[1, 5, 6, 2]], jnp.int32)
    v = enc.init(jax.random.PRNGKey(0), x_long)
    out_l, (h_l, c_l), valid = enc.apply(v, x_long)
    out_s, (h_s, c_s), _ = enc.apply(v, x_short)
    np.testing.assert_array_equal(np.asarray(valid[0]), [1, 1, 1, 1, 0, 0])
    # padding must not influence outputs or final state
    np.testing.assert_allclose(np.asarray(out_l[:, :4]), np.asarray(out_s),
                               atol=1e-6)
    assert np.abs(np.asarray(out_l[:, 4:])).max() == 0.0
    np.testing.assert_allclose(np.asarray(h_l), np.asarray(h_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_l), np.asarray(c_s), atol=1e-6)


def test_episode_pallas_exec_matches_bank(actor_and_vars):
    """Serving path: fused-kernel execution must match the one-hot bank."""
    actor, variables, x, img = actor_and_vars
    o_bank = actor.apply(variables, x, img, method=Actor.episode)
    o_pal = actor.apply(variables, x, img, pallas_exec=True,
                        method=Actor.episode)
    np.testing.assert_array_equal(np.asarray(o_bank["ops"]),
                                  np.asarray(o_pal["ops"]))
    np.testing.assert_allclose(np.asarray(o_bank["imgs"]),
                               np.asarray(o_pal["imgs"]), atol=2e-5)


def test_resnet_bf16_compute_f32_params():
    """vis_bf16: ResNet computes in bfloat16 but params/batch-stats stay
    f32 and the f32-cast output stays close to the pure-f32 forward."""
    from t2onet_tpu.models.resnet import ResNet

    img = jax.random.uniform(jax.random.PRNGKey(3), (2, 3, 16, 16))
    r32 = ResNet(depth=18, num_outputs=16, stage_widths=(8, 8, 16, 16))
    r16 = ResNet(depth=18, num_outputs=16, stage_widths=(8, 8, 16, 16),
                 dtype=jnp.bfloat16)
    variables = r32.init(jax.random.PRNGKey(0), img, train=False)
    # same params drive both: the dtype is compute-only
    y32 = r32.apply(variables, img, train=False)
    y16 = r16.apply(variables, img, train=False)
    assert y16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32), atol=0.05)

    # training mode must keep f32 variables (params AND batch_stats)
    v16 = r16.init(jax.random.PRNGKey(0), img, train=True)
    _, upd = r16.apply(v16, img, train=True, mutable=["batch_stats"])
    for leaf in jax.tree_util.tree_leaves({**v16["params"],
                                           **upd["batch_stats"]}):
        assert leaf.dtype == jnp.float32, leaf.dtype


def test_actor_vis_bf16_episode_runs():
    """An Actor built with cfg.vis_bf16 rolls out finite images and its
    ops stay close to the f32 actor's (same params)."""
    from tests.conftest import tiny_model_config

    cfg = tiny_model_config(encoder_max_len=L, decoder_max_len=2,
                            vis_bf16=True)
    actor = Actor(cfg=cfg, opcfg=OperatorConfig(), vocab_size=VOCAB)
    x = jnp.array([[1, 5, 6, 7, 2, 0, 0, 0, 0]], jnp.int32)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 16, 16))
    variables = actor.init({"params": jax.random.PRNGKey(0)}, x, img)
    out = actor.apply(variables, x, img, method=Actor.episode)
    assert np.isfinite(np.asarray(out["imgs"])).all()
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32


def test_episode_mask_exhaustion_emits_end():
    """decoder_max_len > the 7 allowed ops (the GIER CLIs use 8): once the
    no-repeat mask is fully consumed, the step must emit <END> — not a
    renormalized all-zero row that degenerates to uniform over blocked
    ids (NONE/START/inpaint/color_bg)."""
    from tests.conftest import tiny_model_config

    cfg = tiny_model_config(encoder_max_len=L, decoder_max_len=9)
    actor = Actor(cfg=cfg, opcfg=OperatorConfig(), vocab_size=VOCAB)
    x = jnp.array([[1, 5, 6, 7, 2, 0, 0, 0, 0],
                   [1, 8, 2, 0, 0, 0, 0, 0, 0]], jnp.int32)
    img = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, HW, HW))
    variables = actor.init({"params": jax.random.PRNGKey(0)}, x, img)
    blocked = np.where(np.asarray(EPISODE_OP_MASK) == 0)[0]
    for sample, rng in ((False, None), (True, jax.random.PRNGKey(3))):
        out = actor.apply(variables, x, img, rng=rng, sample=sample,
                          method=Actor.episode)
        ops = np.asarray(out["ops"])          # (B, 9): 7 allowed ops + 2
        assert not np.isin(ops, blocked).any(), ops
        # steps 8-9 can only be <END> (every other allowed op is used up)
        assert (ops[:, 7:] == 2).all(), ops
