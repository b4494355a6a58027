"""RL fine-tuning: REINFORCE over op choices + pathwise gradients for
operator parameters.

The reference ships the RL *machinery* — `Actor.forward` single RL step
with entropy penalty (reference models/actor.py:286-364) and DDPG-era
flags (target_tau/rmsize/warmup, fiveK_train_options.py:52-58) — but not
the training loop itself (SURVEY.md §5.6: "whose training code is not in
this repo"). This module completes that surface TPU-natively, built on
the compiled episode rollout rather than a per-step host loop:

- **Discrete ops** (which operator to apply): REINFORCE with a batch-mean
  baseline. Reward is the negative end-image L1 to the ground truth; each
  sample's advantage weights the sum of its chosen-op log-probs over the
  steps up to and including its first <END>.
- **Continuous parameters**: the pathwise gradient of the same L1 through
  the differentiable operator chain (exactly the episode-L1 phase's
  gradient) — this is the "learning by planning" framework's natural
  estimator, no parameter noise needed.
- **Entropy regularization**: the reference's `get_entropy_penalty`
  (log n_cls − H(π), actor.py:356-364) scaled by `entropy_factor`
  (default 0.05, fiveK_train_options.py).

The REINFORCE term scores sampled ops under the model's own log-probs,
so the RL trainer samples ON-policy (cli/train_rl.py defaults
explore_prob to 0: the rollout draws from the model's softmax, not the
explore-smoothed mixture the episode-L1 phase uses, actor.py:223-236).
Measured failure mode of the off-policy mixture (round 5, 1,280-pair
workspace): uniform-smoothed sampling makes random edits score worse
than editing nothing, so the batch-mean advantage teaches "emit <END>
immediately" — 500 RL iters collapsed greedy val L1 from 0.0545 to the
identity edit's 0.1604. The reference's single RL step makes the same
raw-logprob simplification (reference models/actor.py:286-354) but
ships no training loop to expose it (SURVEY.md §5.6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from t2onet_tpu.models.actor import (Actor, get_entropy_penalty,
                                     select_end_images)
from t2onet_tpu.train.loop import TrainState, _jit_step


def rl_losses(out, gt_img, end_id: int = 2, entropy_factor: float = 0.05,
              pg_weight: float = 0.1):
    """Compute (pathwise L1, REINFORCE, entropy) losses from an episode
    rollout dict (imgs, ops, logprobs).

    Returns (total_loss, metrics dict).
    """
    imgs, ops, logprobs = out["imgs"], out["ops"], out["logprobs"]

    pred = select_end_images(imgs, ops, end_id)
    per_sample_l1 = jnp.abs(pred - gt_img).mean(axis=(1, 2, 3))   # (B,)

    # steps up to and including each sample's first <END> count
    is_end = ops == end_id
    after_end = jnp.cumsum(is_end, axis=1) - is_end.astype(jnp.int32) > 0
    step_w = 1.0 - after_end.astype(logprobs.dtype)               # (B, S)

    chosen_lp = jnp.take_along_axis(
        logprobs, ops[..., None], axis=-1)[..., 0]                # (B, S)

    reward = -per_sample_l1
    # batch-mean baseline + std normalization: the raw advantage scale is
    # the L1 spread (~1e-2), which under-weights the op-choice gradient
    # against the pathwise L1 term; normalizing makes the REINFORCE term's
    # scale independent of the reward's units (measured collapse without
    # it: 500 RL iters drove greedy val L1 to the identity edit).
    baseline = jax.lax.stop_gradient(reward.mean())
    spread = jax.lax.stop_gradient(reward.std() + 1e-4)
    adv = jax.lax.stop_gradient((reward - baseline) / spread)     # (B,)
    n_steps = jnp.maximum(step_w.sum(axis=1), 1.0)                # (B,)
    pg_loss = -((adv[:, None] * chosen_lp * step_w).sum(axis=1)
                / n_steps).mean()

    ent_penalty = get_entropy_penalty(logprobs)[..., 0]           # (B, S)
    ent_loss = (ent_penalty * step_w).sum(axis=1).mean()

    l1_loss = per_sample_l1.mean()
    total = l1_loss + pg_weight * pg_loss + entropy_factor * ent_loss
    return total, {"rl_l1": l1_loss, "rl_pg": pg_loss,
                   "rl_entropy": ent_loss, "rl_reward": reward.mean()}


def make_rl_step(actor: Actor, mesh=None, entropy_factor: float = 0.05,
                 donate: bool = True, param_noise: float = 0.0,
                 pg_weight: float = 0.1):
    """Build the jitted RL episode step.

    batch: dict(x (B,L) int32, img_x (B,3,H,W), gt_img (B,3,H,W))
    param_noise > 0 adds range-scaled exploration noise to predicted op
    parameters (the reference's has_noise machinery, operators.py:113-121;
    param_noise_factor default 0.6, fiveK_train_options.py:56).
    """

    def step_fn(state: TrainState, batch, rng):
        def loss_fn(params):
            out, updates = actor.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["x"], batch["img_x"], rng=rng, sample=True,
                train=True, mutable=["batch_stats"],
                param_noise=param_noise, method=Actor.episode)
            total, metrics = rl_losses(out, batch["gt_img"],
                                       entropy_factor=entropy_factor,
                                       pg_weight=pg_weight)
            return total, (metrics, updates["batch_stats"])

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        return new_state, {"rl_loss": loss, **metrics}

    return _jit_step(step_fn, mesh, donate, has_rng=True)
