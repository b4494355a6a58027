"""Bi-directional multi-layer LSTM language encoder.

Rebuilds the reference's RNNEncoder (reference: models/lang_encoder.py:34-113)
TPU-first: the sort/pack_padded/pad_packed/unsort dance becomes two masked
`lax.scan`s per layer under fixed shapes:

- forward scan: the carry freezes once t >= length (so the final carry is
  the state at each sequence's true last token, like pack_padded's h_n);
- backward scan: runs from t = L-1 down to 0, carry frozen while t >= length
  (so it consumes tokens starting at each sequence's true end — identical
  to packed bidirectional semantics);
- outputs at padding positions are zeroed, matching pad_packed_sequence.

Also implements the frozen-GloVe-with-trainable-special-rows embedding
(reference: models/lang_encoder.py:7-31): gradients flow only to the first
`n_spec` rows when `fix_embedding` is set.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from t2onet_tpu.models.common import init_lstm_params, lstm_step


class RNNEncoder(nn.Module):
    vocab_size: int
    word_vec_dim: int = 300
    hidden_size: int = 256
    n_layers: int = 2
    n_spec_token: int = 4
    pad_id: int = 0
    fix_embedding: bool = False
    word2vec: Optional[np.ndarray] = None   # (vocab - n_spec, word_vec_dim)

    def setup(self):
        if self.word2vec is not None:
            assert self.word2vec.shape[0] == self.vocab_size - self.n_spec_token
            glove = np.asarray(self.word2vec, np.float32)

            def emb_init(key, shape, dtype=jnp.float32):
                spec = jax.random.normal(key, (self.n_spec_token, shape[1]), dtype)
                return jnp.concatenate([spec, jnp.asarray(glove, dtype)], 0)
        else:
            def emb_init(key, shape, dtype=jnp.float32):
                return jax.random.normal(key, shape, dtype)

        self.embedding = self.param(
            "embedding", emb_init, (self.vocab_size, self.word_vec_dim)
        )
        layers = []
        for layer in range(self.n_layers):
            in_dim = self.word_vec_dim if layer == 0 else 2 * self.hidden_size
            fwd = self.param(
                f"lstm_l{layer}_fwd",
                lambda k, d=in_dim: init_lstm_params(k, d, self.hidden_size),
            )
            bwd = self.param(
                f"lstm_l{layer}_bwd",
                lambda k, d=in_dim: init_lstm_params(k, d, self.hidden_size),
            )
            layers.append((fwd, bwd))
        self.layers = layers

    def embed(self, tokens):
        emb = self.embedding
        if self.fix_embedding:
            # trainable special rows + frozen word rows
            # (reference: lang_encoder.py:22-28)
            spec_mask = (
                jnp.arange(self.vocab_size) < self.n_spec_token
            ).astype(emb.dtype)[:, None]
            emb = emb * spec_mask + jax.lax.stop_gradient(emb) * (1.0 - spec_mask)
        return jnp.take(emb, tokens, axis=0)

    def __call__(self, tokens):
        """tokens (B, L) int32, zero-padded.

        Returns:
          outputs  (B, L, 2*hidden) — zeroed at padding positions
          (h, c)   each (n_layers, B, 2*hidden) — directions concatenated,
                   ready for the decoder init (reference
                   action_decoder.py:66-78 `_cat_directions`)
          valid    (B, L) float mask
        """
        b, l = tokens.shape
        lengths = (tokens != self.pad_id).sum(axis=1)          # (B,)
        positions = jnp.arange(l)
        valid = (positions[None, :] < lengths[:, None]).astype(jnp.float32)

        x = self.embed(tokens)                                  # (B, L, E)
        h_stack, c_stack = [], []
        for fwd_p, bwd_p in self.layers:
            f_out, (f_h, f_c) = _masked_scan(fwd_p, x, valid, self.hidden_size,
                                             reverse=False)
            b_out, (b_h, b_c) = _masked_scan(bwd_p, x, valid, self.hidden_size,
                                             reverse=True)
            x = jnp.concatenate([f_out, b_out], axis=-1)        # (B, L, 2H)
            h_stack.append(jnp.concatenate([f_h, b_h], axis=-1))
            c_stack.append(jnp.concatenate([f_c, b_c], axis=-1))
        outputs = x * valid[:, :, None]
        h = jnp.stack(h_stack, axis=0)                          # (layers, B, 2H)
        c = jnp.stack(c_stack, axis=0)
        return outputs, (h, c), valid


def _masked_scan(params, x, valid, hidden, reverse):
    """Run an LSTM over time with carry frozen at invalid steps.

    x (B, L, D); valid (B, L). Returns outputs (B, L, H) (zeroed where
    invalid) and final (h, c).
    """
    b, l, _ = x.shape
    init = (jnp.zeros((b, hidden), x.dtype), jnp.zeros((b, hidden), x.dtype))
    xs = jnp.moveaxis(x, 1, 0)                                  # (L, B, D)
    ms = jnp.moveaxis(valid, 1, 0)[:, :, None]                  # (L, B, 1)

    def step(carry, inp):
        xt, mt = inp
        new_carry, out = lstm_step(params, carry, xt)
        h = jnp.where(mt > 0, new_carry[0], carry[0])
        c = jnp.where(mt > 0, new_carry[1], carry[1])
        return (h, c), out * mt

    (h, c), outs = jax.lax.scan(step, init, (xs, ms), reverse=reverse)
    return jnp.moveaxis(outs, 0, 1), (h, c)
