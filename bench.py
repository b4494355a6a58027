"""Headline benchmark: 512px operator applications / sec / chip.

Measures the hot path of the framework — executing sequences of
differentiable editing operators on 512x512 RGB images — against the
BASELINE.json north star (>= 10,000 512px op applications/sec/chip).

The workload mirrors the episode executor: each image gets a K-step
sequence of mixed ops (different per image, as in a rollout batch) with
per-step parameters; the chain runs under one jit (lax.scan over steps).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/10000}
"""

import json
import time

import numpy as np

BASELINE_OPS_PER_SEC = 10_000.0


def build_workload(batch=32, size=512, steps=5, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    base = np.stack([x, y, 0.5 * (x + y)], 0)
    imgs = np.clip(
        base[None] + rng.uniform(-0.2, 0.2, (batch, 3, size, size))
        .astype(np.float32), 0, 1)
    # mixed plan-ops per (step, image): vocab ids 3..9 excluding inpaint(7)
    op_choices = np.asarray([3, 4, 5, 6, 8, 9])
    ops = rng.choice(op_choices, size=(steps, batch)).astype(np.int32)
    params = rng.uniform(0.1, 0.6, size=(steps, batch, 24)).astype(np.float32)
    return jnp.asarray(imgs), jnp.asarray(ops), jnp.asarray(params)


def make_chain():
    import jax

    from t2onet_tpu.ops import bank

    @jax.jit
    def chain(imgs, ops, params):
        def step(img, inp):
            op_ids, p = inp
            out, _ = bank.execute_bank(img, op_ids, p)
            return out, None

        out, _ = jax.lax.scan(step, imgs, (ops, params))
        return out

    return chain


def main():
    import jax

    imgs, ops, params = build_workload()
    chain = make_chain()
    # warmup/compile
    chain(imgs, ops, params).block_until_ready()

    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = chain(imgs, ops, params)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_rep

    batch, steps = imgs.shape[0], ops.shape[0]
    ops_per_sec = batch * steps / dt
    print(json.dumps({
        "metric": "512px operator applications/sec/chip",
        "value": round(ops_per_sec, 1),
        "unit": "ops/s",
        "vs_baseline": round(ops_per_sec / BASELINE_OPS_PER_SEC, 3),
        "detail": {
            "batch": batch, "steps": steps, "img": "512x512x3 f32",
            "sec_per_chain_batch": round(dt, 5),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
