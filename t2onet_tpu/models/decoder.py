"""Action decoder: one LSTM step + dot-product attention + op head.

Rebuilds the reference Decoder.forward_step (reference:
models/action_decoder.py:38-64) and Attention (reference:
models/attention.py:17-44) as a pure per-step function so the rollout
compiles into one graph (unrolled or scanned) with no host round-trips.

Differences from the reference (deliberate, documented):
- attention is masked to each sample's true request length; the reference
  attends over zero vectors up to the batch max (exactly equivalent at
  batch size 1, the eval protocol).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from t2onet_tpu.models.common import (
    init_lstm_params,
    lstm_step,
    torch_linear_kernel_init,
)

Carry = Tuple[Tuple[jax.Array, jax.Array], ...]   # per-layer (h, c)


class DecoderStep(nn.Module):
    op_vocab_size: int = 11
    word_vec_dim: int = 300
    hidden_size: int = 512          # decoder hidden (2*encoder hidden for bi)
    n_layers: int = 2
    use_attention: bool = True

    def setup(self):
        self.embedding = self.param(
            "embedding",
            lambda k: jax.random.normal(k, (self.op_vocab_size, self.word_vec_dim)),
        )
        self.vis_linear = nn.Dense(
            self.hidden_size, kernel_init=torch_linear_kernel_init, name="vis_linear"
        )
        self.out_linear = nn.Dense(
            self.op_vocab_size, kernel_init=torch_linear_kernel_init, name="out_linear"
        )
        if self.use_attention:
            self.attn_out = nn.Dense(
                self.hidden_size, kernel_init=torch_linear_kernel_init, name="attn_out"
            )
        lstms = []
        for layer in range(self.n_layers):
            in_dim = (self.word_vec_dim + self.hidden_size if layer == 0
                      else self.hidden_size)
            lstms.append(self.param(
                f"lstm_l{layer}",
                lambda k, d=in_dim: init_lstm_params(k, d, self.hidden_size),
            ))
        self.lstms = lstms

    def init_carry(self, encoder_hidden) -> Carry:
        """Decoder init from encoder final hidden (already direction-concat,
        reference action_decoder.py:66-78)."""
        h, c = encoder_hidden                     # (layers, B, 2H_enc=H_dec)
        return tuple((h[i], c[i]) for i in range(self.n_layers))

    def zero_carry(self, batch: int) -> Carry:
        z = jnp.zeros((batch, self.hidden_size))
        return tuple((z, z) for _ in range(self.n_layers))

    def __call__(self, op_ids, carry: Carry, encoder_outputs, encoder_valid,
                 img_feat):
        """One decode step.

        :param op_ids: (B,) int — previous op token.
        :param carry: per-layer (h, c), each (B, hidden).
        :param encoder_outputs: (B, L, hidden).
        :param encoder_valid: (B, L) float mask.
        :param img_feat: (B, vis_dim) visual feature of the current image.
        :return: (op_logprob (B, n_cls), new_carry, attn (B, L),
                  context (B, hidden))
        """
        vis = nn.relu(self.vis_linear(img_feat))
        emb = jnp.take(self.embedding, op_ids, axis=0)          # (B, E)
        x = jnp.concatenate([emb, vis], axis=-1)

        new_carry = []
        for layer, params in enumerate(self.lstms):
            (h, c), out = lstm_step(params, carry[layer], x)
            new_carry.append((h, c))
            x = out
        context = x                                              # (B, hidden)

        attn = None
        if self.use_attention:
            # scores over request tokens (attention.py:37-38), masked to
            # the true length
            scores = jnp.einsum("bh,blh->bl", context, encoder_outputs)
            scores = jnp.where(encoder_valid > 0, scores, -1e9)
            attn = jax.nn.softmax(scores, axis=-1)
            mix = jnp.einsum("bl,blh->bh", attn, encoder_outputs)
            comb = jnp.concatenate([mix, context], axis=-1)
            context = jnp.tanh(self.attn_out(comb))              # (attention.py:42)

        logits = self.out_linear(context)
        op_logprob = jax.nn.log_softmax(logits, axis=-1)
        return op_logprob, tuple(new_carry), attn, context
