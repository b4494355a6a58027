"""Shared initializers and small cells.

Initializers match torch defaults (kaiming-uniform a=sqrt(5) for Linear/Conv
weights == U(±1/sqrt(fan_in)); U(±1/sqrt(fan_in)) biases; U(±1/sqrt(hidden))
for LSTM) so from-scratch training behaves like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """flax Dense kernel (in, out): U(±1/sqrt(fan_in))."""
    fan_in = shape[0]
    lim = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -lim, lim)


def torch_linear_bias_init_for(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        lim = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -lim, lim)

    return init


def lstm_uniform_init_for(hidden: int):
    """torch LSTM init: all weights/biases U(±1/sqrt(hidden))."""
    def init(key, shape, dtype=jnp.float32):
        lim = 1.0 / jnp.sqrt(hidden)
        return jax.random.uniform(key, shape, dtype, -lim, lim)

    return init


def lstm_step(params, carry, x):
    """One torch-semantics LSTM cell step.

    params: dict with w_ih (in, 4H), w_hh (H, 4H), b (4H,) — gate order
    i, f, g, o (torch order: input, forget, cell, output).
    carry: (h, c) each (B, H).  x: (B, in).
    """
    h, c = carry
    gates = x @ params["w_ih"] + h @ params["w_hh"] + params["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return (h_new, c_new), h_new


def init_lstm_params(key, input_dim: int, hidden: int):
    k1, k2, k3 = jax.random.split(key, 3)
    init = lstm_uniform_init_for(hidden)
    return {
        "w_ih": init(k1, (input_dim, 4 * hidden)),
        "w_hh": init(k2, (hidden, 4 * hidden)),
        # torch has two biases b_ih + b_hh; their sum is one effective bias,
        # drawn here as a single U(±1/sqrt(H)) vector.
        "b": init(k3, (4 * hidden,)),
    }
