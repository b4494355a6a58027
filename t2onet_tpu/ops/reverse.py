"""Reverse-operation machinery: invert an edit by fitting the inverse op.

Spec: reference models/operators.py:920-1010 — `rev_ops_dict` pairs each
op with its inverse family (brightness<->brightness, blur<->sharpness,
contrast<->contrast), `get_param_naive` fits the parameter that maps one
image to another (scipy Nelder-Mead over the full-image L2 residual), and
`get_reverse` composes them. Here the fit is a jitted on-device Adam
descent through the differentiable op (multi-start for robustness).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from t2onet_tpu.ops import operators as O

# (reference operators.py:920)
rev_ops_dict = {"brightness": "brightness", "blur": "sharpness",
                "sharpness": "blur", "contrast": "contrast"}


def apply_operator(img, mask, param, opname: str):
    """Apply op by name with mask+clamp (reference operators.py:948-954)."""
    fn = O.OP_FNS[opname]
    p = jnp.asarray(np.atleast_1d(np.asarray(param, np.float32)))[None]
    return O.mask_blend(fn(jnp.asarray(img), p), jnp.asarray(img), mask)


@functools.partial(jax.jit, static_argnames=("opname", "n_iters", "lr"))
def _fit(img, target, inits, opname: str, n_iters: int = 300,
         lr: float = 0.05):
    """Fit params (S, k) minimizing the L2 residual of op(img, p) vs target
    (the reference objective: (pred - out).norm(), operators.py:939-940).

    Gradients flow through a LEAKY clamp (slope 0.05 outside [0, 1]): the
    hard clip's zero gradient strands every Adam start on a plateau when
    the edit saturates (e.g. reversing a strong brightness push on a
    bright image), a failure mode the reference's derivative-free
    Nelder-Mead doesn't have. Residuals are always scored with the true
    hard clamp."""
    fn = O.OP_FNS[opname]

    def resid(params, leak=0.0):
        def one(p):
            raw = fn(img, p[None])
            hard = O.mask_blend(raw, img)
            return hard + leak * (raw - jnp.clip(raw, 0.0, 1.0))

        out = jax.vmap(one)(params)
        return jnp.sqrt(((out - target[None]) ** 2).sum(axis=(1, 2, 3, 4))
                        + 1e-12)

    tx = optax.adam(lr)
    state = tx.init(inits)

    def body(_, carry):
        p, s = carry
        g = jax.grad(lambda q: resid(q, leak=0.05).sum())(p)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s

    params, _ = jax.lax.fori_loop(0, n_iters, body, (inits, state))
    return params, resid(params)


def get_param_naive(img, out, mask, param0, opname: str, n_starts: int = 4,
                    n_iters: int = 300, lr: float = 0.05
                    ) -> Tuple[List[float], bool]:
    """Estimate the parameter mapping img -> out (reference
    operators.py:922-945). Returns (params list, success flag)."""
    del mask  # reference passes mask=None in all reverse paths
    p0 = np.atleast_1d(np.asarray(param0, np.float32))
    rng = np.random.default_rng(0)
    # strategic starts beside p0: ops clamp internally (e.g. brightness's
    # clip(v*(1+p))), so a p0 past the clamp knee (p0 <= -1 after a strong
    # forward edit) has zero gradient at EVERY nearby start and Adam never
    # moves — the reference's Nelder-Mead has no such plateau. Scaled-down
    # and zero starts always include an interior point with signed gradient.
    fixed = [p0, 0.5 * p0, np.zeros_like(p0)]
    noise = [p0 + rng.normal(0, 0.3, p0.shape).astype(np.float32)
             for _ in range(max(n_starts - len(fixed), 1))]
    inits = np.stack(fixed + noise)
    params, resids = _fit(jnp.asarray(img), jnp.asarray(out),
                          jnp.asarray(inits), opname, n_iters, lr)
    best = int(jnp.argmin(resids))
    rel = float(resids[best]) / (float(jnp.sqrt((jnp.asarray(out) ** 2)
                                                .sum())) + 1e-8)
    return list(np.asarray(params[best], np.float64)), rel < 0.05


def get_rev_param0(param, opname: str):
    """Initial guess for the reverse op (reference operators.py:957-965)."""
    if opname in ("brightness", "contrast"):
        return [-param[0]]
    if opname in ("blur", "sharpness"):
        return list(param)
    raise NameError(opname)


def get_reverse(img, out, mask, param, opname: str):
    """Fit the inverse edit out -> img (reference operators.py:968-984)."""
    rev_opname = rev_ops_dict[opname]
    rev_param0 = get_rev_param0(param, opname)
    rev_param, ok = get_param_naive(out, img, mask, rev_param0, rev_opname)
    assert ok, "the optimization for reverse operation failed!"
    return rev_param, rev_opname
