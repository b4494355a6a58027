"""The Actor: language + vision -> operation program -> edited image.

Rebuilds the reference Actor (reference: models/actor.py:36-364) TPU-first:

- `supervised` (teacher forcing; reference actor.py:116-181): the per-step
  Python loop with host-side `divide_op_group` regrouping becomes a
  statically-unrolled in-graph loop over the fixed op horizon using the
  one-hot operator bank (t2onet_tpu.ops.bank). Since no loss in the
  reference training consumes the teacher-forced *images* (train loss =
  op NLL + param MSE; train_seq2seqL1.py:56-61), image execution is
  skipped unless `with_images=True` — pure dead compute in the reference.
- `episode` (free rollout; reference actor.py:184-284): `decoder_max_len`
  steps fully in-graph, with the explore-prob smoothing, the hard op mask
  blocking NONE/START/inpaint/color_bg, and the no-repeat mask update
  (actor.py:211, 223-236) as one-hot arithmetic. Sampling is a Gumbel
  categorical under an explicit PRNG key.

Everything here jits, vmaps, and pjits over a batch-sharded mesh.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from t2onet_tpu.config import ModelConfig, OperatorConfig
from t2onet_tpu.models.decoder import DecoderStep
from t2onet_tpu.models.encoder import RNNEncoder
from t2onet_tpu.models.resnet import ResNet
from t2onet_tpu.ops import bank

# Block NONE, START, inpaint_obj, color_bg during rollout
# (reference: actor.py:211; vocab order <NONE> <START> <END> brightness
#  contrast saturation hue inpaint_obj tint sharpness color_bg).
# numpy (not jnp) so importing this module never initializes a backend —
# CLIs must still be able to select the CPU platform after import
import numpy as _np  # noqa: E402

EPISODE_OP_MASK = _np.array(
    [0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.0, 1.0, 1.0, 0.0], dtype=_np.float32
)

END_OP_ID = 2  # <END> position in the op vocab (reference actor.py:211)


def _renorm_masked_probs(probs, op_mask, n_vocab):
    """Hard-mask + renormalize (reference actor.py:227-228). When the
    no-repeat mask is fully exhausted (decoder_max_len exceeds the number
    of allowed ops — a config the reference never ships but the GIER CLIs
    use), the renormalized row would be all-zero and the sampler would
    degenerate to uniform over ALL ids including blocked ones; emit <END>
    instead — always legal and semantically terminal (any step past the
    first <END> is ignored downstream)."""
    probs = probs * op_mask
    total = probs.sum(axis=1, keepdims=True)
    end = jax.nn.one_hot(
        jnp.full((probs.shape[0],), END_OP_ID), n_vocab, dtype=probs.dtype)
    return jnp.where(total > 0.0, probs / (total + 1e-30), end)


class ParamHeads(nn.Module):
    """Stacked per-op parameter heads (reference operators.py:43-55, 73-88)."""

    opcfg: OperatorConfig
    ctx_dim: int = 512
    fc_dim: int = 512

    @nn.compact
    def __call__(self, context, with_raw: bool = False):
        # shapes + torch-Linear uniform limits come from ONE shared spec
        # (bank.head_init_specs) so the flax module can never drift from
        # the standalone bank helper the tests oracle against
        specs = bank.head_init_specs(self.ctx_dim, self.fc_dim)

        def draw(name):
            shape, lim = specs[name]
            return self.param(
                name,
                lambda k, s, lim=lim: jax.random.uniform(
                    k, s, minval=-lim, maxval=lim),
                shape)

        heads = bank.HeadParams(w1=draw("w1"), b1=draw("b1"),
                                w2=draw("w2"), b2=draw("b2"))
        raw = bank.raw_head_features(heads, context)
        squashed = bank.squash_params(raw, self.opcfg)
        if with_raw:
            # raw is the bin-logit surface for the discrete (classification)
            # parameter mode (reference operators.py:50-54, 73-88)
            return squashed, raw
        return squashed


class Actor(nn.Module):
    cfg: ModelConfig
    opcfg: OperatorConfig
    vocab_size: int
    word2vec: Optional[object] = None   # np.ndarray (vocab-4, 300) or None
    explore_prob: float = 0.05

    def setup(self):
        self.vis_encoder = ResNet(depth=self.cfg.resnet_depth,
                                  num_outputs=self.cfg.vis_feat_dim,
                                  stage_widths=self.cfg.resnet_widths,
                                  dtype=(jnp.bfloat16 if self.cfg.vis_bf16
                                         else jnp.float32))
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.lang_encoder = RNNEncoder(
            vocab_size=self.vocab_size,
            word_vec_dim=self.cfg.word_vec_dim,
            hidden_size=self.cfg.hidden_size,
            n_layers=self.cfg.n_layers,
            n_spec_token=self.cfg.n_spec_token,
            pad_id=self.cfg.null_id,
            fix_embedding=self.cfg.fix_input_embedding,
            word2vec=self.word2vec,
        )
        self.decoder = DecoderStep(
            op_vocab_size=self.cfg.op_vocab_size,
            word_vec_dim=self.cfg.word_vec_dim,
            hidden_size=self.cfg.decoder_hidden,
            n_layers=self.cfg.n_layers,
            use_attention=self.cfg.use_attention,
        )
        self.heads = ParamHeads(opcfg=self.opcfg,
                                ctx_dim=self.cfg.decoder_hidden,
                                fc_dim=self.cfg.operator_fc_dim)

    # ------------------------------------------------------------------
    def _attn_mask(self, enc_valid):
        """Attention mask handed to the decoder.

        Default: each sample's true request length. With
        cfg.attend_batch_max: every position up to the BATCH-max length,
        reproducing the reference's unmasked Attention over zero-padded
        encoder outputs (models/attention.py:37-38) — pad positions score
        0 and soak softmax mass. See ModelConfig.attend_batch_max.
        """
        if not self.cfg.attend_batch_max:
            return enc_valid
        lengths = enc_valid.sum(axis=1)                        # (B,)
        pos = jnp.arange(enc_valid.shape[1], dtype=lengths.dtype)
        return jnp.broadcast_to(pos < jnp.max(lengths),
                                enc_valid.shape).astype(enc_valid.dtype)

    def vis_feat(self, img, train: bool):
        """ResNet feature + BN + relu (reference actor.py:142-143)."""
        feat = self.vis_encoder(img, train=train)
        return nn.relu(self.bn1(feat, use_running_average=not train))

    def _step_params(self, context, rng=None, sample: bool = False):
        """Per-op params from the decoder context: regression, or the
        discrete classification mode when cfg.discrete_param (reference
        extract_parameters, operators.py:73-88).

        Returns (params (B, 8, 24), bin log-probs (B, 8, discrete_step) or
        None in regression mode) — the log-probs feed the bin
        cross-entropy that trains the discrete heads (train/loop.py)."""
        if not self.cfg.discrete_param:
            return self.heads(context), None
        cont, raw = self.heads(context, with_raw=True)
        return bank.select_discrete_params(
            raw, cont, rng, sample, self.explore_prob, self.opcfg,
            self.cfg.discrete_step)

    def __call__(self, x, img_x):
        """Default apply = greedy episode (used for init/compile checks)."""
        return self.episode(x, img_x, rng=None, sample=False, train=False)

    # ------------------------------------------------------------------
    def supervised(self, x, y, img_x, img_y, train: bool = True,
                   with_images: bool = False, mask=None, step_masks=None,
                   per_step_bn: bool = False):
        """Teacher-forced pass (reference actor.py:116-181).

        :param x: (B, L) request tokens.
        :param y: (B, T) gt op sequence [START, op*, END, NONE...].
        :param img_x: (B, 3, H, W) input image.
        :param img_y: (B, T-1, 3, H, W) per-step teacher images
            (planner edits; last = gt).
        :param mask: optional (B, 1|3, H, W) one mask blended at every
            step.
        :param step_masks: optional (B, T-2, 1, H, W) per-decode-step gt
            masks (GIER local editing; the reference supervised_forward's
            mask argument, actor.py:116-124 — its per-group
            index_select at actor.py:165 is what this realizes under
            fixed shapes). Overrides `mask` when given.
        :param per_step_bn: run one ResNet forward per decode step (the
            reference's exact BatchNorm semantics: normalization statistics
            over the (B,) step batch, running averages chained across the
            n_dec sequential calls — actor.py:142). Default False batches
            all steps into one forward; identical in eval mode.
        :return: (pred_imgs (B, T-2, 3, H, W) or None,
                  pred_params (B, T-2, 24),
                  op_logprobs (B, T-1, n_cls))
            — plus a 4th element, bin log-probs (B, T-2, 8, discrete_step),
            when cfg.discrete_param (the classification targets that make
            the discrete heads trainable; the reference's discrete mode
            has no gradient path to its bin logits in-repo).
        """
        enc_out, enc_hidden, enc_valid = self.lang_encoder(x)
        enc_valid = self._attn_mask(enc_valid)
        carry = self.decoder.init_carry(enc_hidden)
        n_dec = y.shape[1] - 1                      # decode positions 1..n_dec

        # Teacher forcing fixes every step's input image upfront (img_x then
        # img_y[:, i-2]) — so unlike the reference's per-step ResNet calls
        # (actor.py:142, the dominant training cost per SURVEY §3.1), all
        # n_dec visual encodings run as ONE batched forward. BatchNorm stats
        # are computed over the (B * n_dec) batch instead of per step — a
        # documented deviation (docs/PARITY.md), reverted by per_step_bn.
        b = img_x.shape[0]
        step_imgs = jnp.concatenate(
            [img_x[:, None], img_y[:, : n_dec - 1]], axis=1)  # (B, n_dec, ...)
        if per_step_bn:
            feats = jnp.stack(
                [self.vis_feat(step_imgs[:, i], train) for i in range(n_dec)],
                axis=1)
        else:
            flat = step_imgs.reshape((b * n_dec,) + step_imgs.shape[2:])
            feats = self.vis_feat(flat, train).reshape(b, n_dec, -1)

        logprobs, params, imgs, bin_logps = [], [], [], []
        cur_img = img_x
        for i in range(1, n_dec + 1):
            feat = feats[:, i - 1]
            logprob, carry, _, context = self.decoder(
                y[:, i - 1], carry, enc_out, enc_valid, feat)
            logprobs.append(logprob)
            if i == n_dec:
                break
            per_op_params, bin_logp = self._step_params(context)  # (B, 8, 24)
            if self.cfg.discrete_param:
                bin_logps.append(bin_logp)
            step_mask = step_masks[:, i - 1] if step_masks is not None else mask
            if with_images:
                out_img, chosen = bank.execute_bank(
                    cur_img, y[:, i], per_op_params, mask=step_mask)
                imgs.append(out_img)
            else:
                chosen = bank.select_params(y[:, i], per_op_params)
            params.append(chosen)
            cur_img = img_y[:, i - 1]               # teacher forcing (actor.py:176)
        pred_params = jnp.stack(params, axis=1)
        op_logprobs = jnp.stack(logprobs, axis=1)
        pred_imgs = jnp.stack(imgs, axis=1) if with_images else None
        if self.cfg.discrete_param:
            return pred_imgs, pred_params, op_logprobs, \
                jnp.stack(bin_logps, axis=1)
        return pred_imgs, pred_params, op_logprobs

    # ------------------------------------------------------------------
    def episode(self, x, img_x, rng=None, sample: bool = False,
                train: bool = False, masks=None,
                pallas_exec: bool = False,
                param_noise: float = 0.0,
                probe_size: int | None = None):
        """Free-running rollout (reference actor.py:184-284).

        :param x: (B, L) request tokens.
        :param img_x: (B, 3, H, W).
        :param rng: PRNG key (required when sample=True).
        :param masks: optional (B, n_vocab, 1, H, W) per-op gt masks
            (GIER local editing); gathered by the predicted op.
        :param pallas_exec: execute each step with the fused Pallas step
            kernel (only the selected branch computed, forward AND
            backward — custom VJP, gradients identical to the bank)
            instead of the differentiable one-hot bank which materializes
            all 8 op outputs. Faster for serving/eval and for
            episode-phase training; requires a TPU backend (CPU falls
            back to the Pallas interpreter). No inpaint_fn support.
        :param param_noise: > 0 adds range-scaled exploration noise to the
            predicted parameters, clamped to each op's range (the
            reference's has_noise path, operators.py:113-121; its
            param_noise_factor default is 0.6). Requires rng.
        :param probe_size: decode at a reduced probe resolution: the
            vis encoder sees a bilinear-resized view of the current
            image while operators/loss run at full resolution (the
            serve.py two-stage design, applied to training: the
            per-step ResNet decode dominates episode latency). Trades
            the reference's exact BN/vis fidelity for throughput —
            convergence A/B-gated (docs/ROADMAP.md round-5). Gradients
            still flow through the resize into the operator chain.
        :return: dict with
            imgs   (B, S, 3, H, W) image after each step
            ops    (B, S) chosen vocab op ids
            params (B, S, 24) chosen (padded) parameters
            logprobs (B, S, n_cls) decoder log-probs per step
        """
        b = x.shape[0]
        steps = self.cfg.decoder_max_len
        enc_out, enc_hidden, enc_valid = self.lang_encoder(x)
        enc_valid = self._attn_mask(enc_valid)
        carry = self.decoder.init_carry(enc_hidden)

        op_mask = jnp.broadcast_to(jnp.asarray(EPISODE_OP_MASK),
                                   (b, self.cfg.op_vocab_size))
        pred_op = jnp.full((b,), self.cfg.start_id, jnp.int32)

        # The rollout is a lax.scan (via nn.scan), NOT an unrolled python
        # loop: the step body — ResNet vis-encode + decoder step + operator
        # bank — compiles ONCE instead of decoder_max_len times, which cuts
        # XLA compile time/memory ~5x for the episode train step (the
        # dominant cost on both CPU-mesh CI and first TPU compile). This is
        # the SURVEY §7 "episode_scan": no host round-trips, one graph.
        if (sample or param_noise > 0.0) and rng is None:
            raise ValueError(
                "episode(sample=True / param_noise>0) needs an explicit "
                "rng: a silent default key would make every 'random' "
                "rollout (and every noise draw) identical")
        key0 = rng if rng is not None else jax.random.PRNGKey(0)

        def step(mdl, carry, _):
            img, pred_op, op_mask, dec_carry, key = carry
            probe = img
            if probe_size is not None and probe_size != img.shape[-1]:
                probe = jax.image.resize(
                    img, (img.shape[0], 3, probe_size, probe_size),
                    method="bilinear")
            feat = mdl.vis_feat(probe, train)
            logprob, dec_carry, attn, context = mdl.decoder(
                pred_op, dec_carry, enc_out, enc_valid, feat)
            # explore smoothing + hard mask + renorm (actor.py:223-228)
            probs = (jnp.exp(logprob) * (1.0 - mdl.explore_prob)
                     + mdl.explore_prob)
            probs = _renorm_masked_probs(probs, op_mask,
                                         mdl.cfg.op_vocab_size)
            if sample:
                key, sub = jax.random.split(key)
                pred_op = jax.random.categorical(sub, jnp.log(probs + 1e-30),
                                                 axis=-1)
            else:
                pred_op = jnp.argmax(probs, axis=-1)
            pred_op = pred_op.astype(jnp.int32)
            # no-repeat: zero the chosen op (actor.py:235-236)
            op_mask = op_mask * (1.0 - jax.nn.one_hot(
                pred_op, mdl.cfg.op_vocab_size, dtype=op_mask.dtype))

            step_mask = None
            if masks is not None:
                onehot_v = jax.nn.one_hot(pred_op, mdl.cfg.op_vocab_size,
                                          dtype=img.dtype)
                step_mask = jnp.einsum("bv,bvchw->bchw", onehot_v, masks)

            if mdl.cfg.discrete_param and sample:
                key, sub = jax.random.split(key)
            else:
                sub = None
            per_op_params, _ = mdl._step_params(context, sub, sample)
            if param_noise > 0.0:
                key, sub = jax.random.split(key)
                per_op_params = bank.add_param_noise(per_op_params, sub,
                                                     mdl.opcfg, param_noise)
            if pallas_exec:
                from t2onet_tpu.ops.pallas_fused import (
                    fused_step, vocab_ops_to_slots)

                chosen = bank.select_params(pred_op, per_op_params)
                img = fused_step(img, vocab_ops_to_slots(pred_op[:, None])[:, 0],
                                 chosen, mask=step_mask)
            else:
                img, chosen = bank.execute_bank(img, pred_op, per_op_params,
                                                mask=step_mask)
            ys = (pred_op, chosen, img, logprob,
                  attn if attn is not None else jnp.zeros_like(enc_valid))
            return (img, pred_op, op_mask, dec_carry, key), ys

        scan = nn.scan(
            step,
            variable_broadcast=["params"] if train else ["params",
                                                         "batch_stats"],
            variable_carry=["batch_stats"] if train else [],
            split_rngs={"params": False},
            length=steps,
        )
        carry0 = (img_x, pred_op, op_mask, carry, key0)
        _, (ops_t, params_t, imgs_t, logprobs_t, attn_t) = scan(
            self, carry0, None)

        return {
            "imgs": jnp.moveaxis(imgs_t, 0, 1),
            "ops": jnp.moveaxis(ops_t, 0, 1),
            "params": jnp.moveaxis(params_t, 0, 1),
            "logprobs": jnp.moveaxis(logprobs_t, 0, 1),
            "attn": (jnp.moveaxis(attn_t, 0, 1)
                     if self.cfg.use_attention else None),
        }


    # ------------------------------------------------------------------
    def rl_step(self, x, img_x, carry, op, rng, train: bool = False,
                masks=None, param_noise: float = 0.0, op_mask=None):
        """Single RL step (reference actor.py:286-354 `forward`): decode one
        op from the previous op + current image, sample under the hard op
        mask, execute, and re-decode for the next context. param_noise > 0
        adds range-scaled exploration noise to the predicted parameters
        (the reference's has_noise path, operators.py:113-121). Thread
        `op_mask` (returned updated) across chained calls to keep the
        no-repeat constraint episode() enforces; None starts a fresh
        episode mask. Returns (pred_img, op_logprob, entropy_penalty,
        context, next_context, new_carry, pred_op, new_op_mask)."""
        b = x.shape[0]
        enc_out, enc_hidden, enc_valid = jax.lax.stop_gradient(
            self.lang_encoder(x))                   # no_grad (actor.py:299)
        enc_valid = self._attn_mask(enc_valid)
        feat = self.vis_feat(img_x, train)
        logprob, carry, _, context = self.decoder(op, carry, enc_out,
                                                  enc_valid, feat)
        entropy_penalty = get_entropy_penalty(logprob)
        probs = jnp.exp(logprob) * (1.0 - self.explore_prob) + self.explore_prob
        if op_mask is None:
            op_mask = jnp.broadcast_to(jnp.asarray(EPISODE_OP_MASK),
                                       (b, self.cfg.op_vocab_size))
        probs = _renorm_masked_probs(probs, op_mask, self.cfg.op_vocab_size)
        rng, op_rng = jax.random.split(rng)
        pred_op = jax.random.categorical(op_rng, jnp.log(probs + 1e-30),
                                         axis=-1).astype(jnp.int32)
        step_mask = None
        if masks is not None:
            onehot_v = jax.nn.one_hot(pred_op, self.cfg.op_vocab_size,
                                      dtype=img_x.dtype)
            step_mask = jnp.einsum("bv,bvchw->bchw", onehot_v, masks)
        if self.cfg.discrete_param:
            rng, sub = jax.random.split(rng)
            per_op_params, _ = self._step_params(context, sub, sample=True)
        else:
            per_op_params = self.heads(context)
        if param_noise > 0.0:
            rng, sub = jax.random.split(rng)
            per_op_params = bank.add_param_noise(per_op_params, sub,
                                                 self.opcfg, param_noise)
        pred_img, _ = bank.execute_bank(img_x, pred_op, per_op_params,
                                        mask=step_mask)
        # re-decode on the produced image for the next context (actor.py:350-352)
        feat2 = self.vis_feat(pred_img, train)
        _, _, _, next_context = self.decoder(pred_op, carry, enc_out,
                                             enc_valid, feat2)
        new_op_mask = op_mask * (1.0 - jax.nn.one_hot(
            pred_op, self.cfg.op_vocab_size, dtype=op_mask.dtype))
        return (pred_img, logprob, entropy_penalty, context, next_context,
                carry, pred_op, new_op_mask)


def get_entropy_penalty(logprobs):
    """log(n_cls) - H(p) per sample (reference actor.py:356-364)."""
    probs = jnp.exp(logprobs)
    entropy = -(probs * logprobs).sum(axis=-1, keepdims=True)
    return jnp.log(float(logprobs.shape[-1])) - entropy


def select_end_images(imgs, ops, end_id: int = 2):
    """Pick each sample's image at its first <END> token, else the last step
    (reference train_seq2seqL1.py:79-84, test_seq2seqL1.py:62-67) —
    mask-based instead of a host loop.

    imgs (B, S, 3, H, W); ops (B, S) -> (B, 3, H, W).
    """
    b, s = ops.shape
    is_end = ops == end_id
    any_end = is_end.any(axis=1)
    first_end = jnp.argmax(is_end, axis=1)          # 0 if none; gated below
    idx = jnp.where(any_end, first_end, s - 1)
    return jnp.take_along_axis(
        imgs, idx[:, None, None, None, None], axis=1
    ).squeeze(1)
