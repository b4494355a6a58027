"""Jitted training steps: alternating supervised / end-to-end-L1 phases.

Loss protocol matches the reference trainer exactly
(reference: experiments/t2onet/train_seq2seqL1.py:51-92):

- odd iterations (supervised): op NLL averaged over positions
  1..step-1 (step = batch-max valid op-seq length — realized here as a
  position mask under static shapes) + param MSE summed and normalized by
  the number of nonzero gt params;
- even iterations (episode): free rollout, pick each sample's image at its
  first <END>, mean-|.|-L1 to the ground-truth image.

One Adam optimizer over everything (train_seq2seqL1.py:169), both phases
stepping it — as in the reference.

Data parallelism: steps are jitted with the batch sharded over the mesh's
`data` axis and state replicated; XLA inserts the gradient all-reduce
(psum) over ICI.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from t2onet_tpu.models.actor import Actor, select_end_images
from t2onet_tpu.parallel.mesh import batch_sharding, replicated


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt,
        )


def create_train_state(actor: Actor, rng, sample_x, sample_img,
                       learning_rate: float = 1e-3) -> TrainState:
    variables = actor.init({"params": rng}, sample_x, sample_img)
    tx = optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def supervised_losses(logprobs, pred_params, y, gt_params, null_id: int = 0):
    """(op_loss, param_loss) — reference train_seq2seqL1.py:56-61.

    logprobs (B, T-1, n_cls); pred_params (B, T-2, 24); y (B, T);
    gt_params (B, T-2, 24).
    """
    b, n_pos, n_cls = logprobs.shape
    targets = y[:, 1:]                                     # (B, T-1)
    # position i (1-indexed) is inside the batch-max step iff any sample
    # still has a non-NULL token there (y is left-packed)
    pos_mask = (targets != null_id).any(axis=0).astype(logprobs.dtype)  # (T-1,)
    nll = -jnp.take_along_axis(
        logprobs, targets[:, :, None], axis=2).squeeze(-1)  # (B, T-1)
    op_loss = (nll * pos_mask[None, :]).sum() / (b * pos_mask.sum())

    nnz = (gt_params != 0).sum()
    param_loss = ((pred_params - gt_params) ** 2).sum() / jnp.maximum(nnz, 1)
    return op_loss, param_loss


def discrete_param_loss(bin_logp, y, gt_params, opcfg, num: int = 10):
    """Bin cross-entropy for the discrete parameter mode (new — the
    reference's op_param_classifier has NO training loss in-repo: the MSE
    on the gathered grid value has zero gradient to the bin logits, so its
    discrete heads could never learn). Target = nearest grid bin of the gt
    scalar under the gt op; masked to discrete-capable ops with a nonzero
    gt param, normalized like the reference's param MSE.

    bin_logp (B, S, N_OPS, num); y (B, T); gt_params (B, S, 24).
    """
    from t2onet_tpu.ops import bank

    s = bin_logp.shape[1]
    ops = y[:, 1:1 + s]                                    # gt op per step
    exec_idx = ops - bank.VOCAB_OFFSET
    gt_scalar = gt_params[..., 0]
    bins, sup = bank.gt_param_bins(gt_scalar, exec_idx, opcfg, num)
    safe_idx = jnp.clip(exec_idx, 0, bank.N_OPS - 1)
    lp_op = jnp.take_along_axis(
        bin_logp, safe_idx[:, :, None, None].astype(jnp.int32),
        axis=2).squeeze(2)                                 # (B, S, num)
    lp = jnp.take_along_axis(lp_op, bins[:, :, None], axis=2).squeeze(2)
    mask = (sup & (gt_scalar != 0)).astype(lp.dtype)
    return -(lp * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def episode_l1_loss(imgs, ops, gt_img, end_id: int = 2):
    """Mean L1 between the <END>-selected rollout image and gt
    (reference train_seq2seqL1.py:79-85)."""
    pred = select_end_images(imgs, ops, end_id)
    return jnp.abs(pred - gt_img).mean()


# ---------------------------------------------------------------------------
# jitted steps
# ---------------------------------------------------------------------------

def make_supervised_step(actor: Actor, mesh=None, donate: bool = True,
                         per_step_bn: bool = False, state_sharding=None):
    """Build the jitted supervised step.

    batch: dict(x (B,L) int32, y (B,T) int32, img_x (B,3,H,W),
                img_y (B,T-1,3,H,W), gt_params (B,T-2,24))
    per_step_bn: reference-exact per-step BatchNorm statistics
    (see Actor.supervised).

    GIER local-edit masks are deliberately NOT an input here: the
    supervised loss (NLL + param MSE, reference train_seq2seqL1.py:56-61)
    never consumes executed images — in the reference the masked image
    execution inside supervised_forward is dead compute, and here it is
    skipped entirely (Actor.supervised with_images=False). Masks affect
    training only through the episode phase (make_episode_step
    with_masks). Shipping a (B,T-2,1,H,W) mask tensor into this step
    would be pure host->device traffic that XLA DCEs.
    """

    discrete = actor.cfg.discrete_param

    def step_fn(state: TrainState, batch):
        def loss_fn(params):
            out, updates = actor.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["x"], batch["y"], batch["img_x"], batch["img_y"],
                train=True, per_step_bn=per_step_bn,
                mutable=["batch_stats"],
                method=Actor.supervised)
            pi, pred_params, logprobs = out[:3]
            op_loss, param_loss = supervised_losses(
                logprobs, pred_params, batch["y"], batch["gt_params"])
            if discrete:
                # the MSE above carries no gradient into the bin logits;
                # the bin CE is what trains the discrete heads
                param_loss = param_loss + discrete_param_loss(
                    out[3], batch["y"], batch["gt_params"], actor.opcfg,
                    actor.cfg.discrete_step)
            return op_loss + param_loss, (op_loss, param_loss,
                                          updates["batch_stats"])

        (loss, (op_loss, param_loss, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        metrics = {"loss": loss, "op_loss": op_loss, "param_loss": param_loss}
        return new_state, metrics

    return _jit_step(step_fn, mesh, donate, state_sharding=state_sharding)


def make_episode_step(actor: Actor, mesh=None, sample: bool = True,
                      donate: bool = True, state_sharding=None,
                      with_masks: bool = False, pallas_exec: bool = False,
                      probe_size=None):
    """Build the jitted episode (end-to-end L1) step.

    batch: dict(x (B,L) int32, img_x (B,3,H,W), gt_img (B,3,H,W)
                [+ masks_vocab (B,n_vocab,1,H,W) when with_masks — the
                 per-op gt masks the rollout gathers by predicted op,
                 reference get_gt_mask actor.py:78-98])
    pallas_exec: run each rollout step through the fused Pallas step
    kernel (custom VJP, selected-branch forward AND backward) instead of
    the 8-branch one-hot bank — same gradients, faster episode training
    on TPU.
    probe_size: decode each rollout step at this probe resolution while
    executing operators and the L1 loss at full resolution (see
    Actor.episode; convergence A/B-gated).
    """

    def step_fn(state: TrainState, batch, rng):
        def loss_fn(params):
            out, updates = actor.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["x"], batch["img_x"], rng=rng, sample=sample,
                masks=batch["masks_vocab"] if with_masks else None,
                pallas_exec=pallas_exec, probe_size=probe_size,
                train=True, mutable=["batch_stats"], method=Actor.episode)
            loss = episode_l1_loss(out["imgs"], out["ops"], batch["gt_img"])
            return loss, updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        return new_state, {"L1_loss": loss}

    return _jit_step(step_fn, mesh, donate, has_rng=True,
                     state_sharding=state_sharding)


def make_eval_episode(actor: Actor, mesh=None):
    """Greedy rollout for validation (no state mutation)."""

    def fn(state: TrainState, batch):
        out = actor.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["x"], batch["img_x"], sample=False, train=False,
            method=Actor.episode)
        pred = select_end_images(out["imgs"], out["ops"])
        return pred, out

    if mesh is None:
        return jax.jit(fn)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(fn, in_shardings=(rep, bs), out_shardings=(bs, bs))


def _jit_step(step_fn, mesh, donate, has_rng: bool = False,
              state_sharding=None):
    """state_sharding: optional TrainState-shaped pytree of NamedShardings
    (see parallel/mesh.py:state_shardings) for 2-D (data x model) layouts;
    default is fully-replicated state (pure DP)."""
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    st = rep if state_sharding is None else state_sharding
    in_sh = (st, bs) + ((rep,) if has_rng else ())
    return jax.jit(
        step_fn,
        in_shardings=in_sh,
        out_shardings=(st, rep),
        donate_argnums=(0,) if donate else (),
    )
