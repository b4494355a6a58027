"""Probe 4: ablate the pl.when region cost in the v2 chain kernel.

Variants (same b128/512px/K5 workload):
  copy_loop   out=img copy + empty 5-iter fori_loop        -> pipeline floor
  when_noop   + 7 EMPTY pl.when regions per step           -> region overhead
  when_store  + 7 pl.when regions each storing a full copy -> store-in-cond
  switch_unit lax.switch over unit-return store branches   -> 1 dispatch/step
"""

import functools
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_t2onet"))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_t2onet"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from t2onet_tpu.ops import pallas_fused as pf  # noqa: E402

B, S, K = 128, 512, 5
_T0 = time.perf_counter()


def log(msg):
    print(f"[probe4 +{time.perf_counter() - _T0:6.1f}s] {msg}", flush=True)


def make_workload(vocab_choices, seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:S, 0:S].astype(np.float32) / (S - 1)
    base = np.stack([x, y, 0.5 * (x + y)], 0)
    imgs = np.clip(base[None] + rng.uniform(-0.2, 0.2, (B, 3, S, S))
                   .astype(np.float32), 0, 1)
    vocab_ids = rng.choice(vocab_choices, size=(B, K)).astype(np.int32)
    params = rng.uniform(0.1, 0.6, size=(B, K, 24)).astype(np.float32)
    return (jnp.asarray(imgs), pf.vocab_ops_to_slots(jnp.asarray(vocab_ids)),
            jnp.asarray(params))


def timeit(f, *args, reps=20, trials=3):
    out = f(*args)
    _ = np.asarray(out[0, 0, 0, :1])
    dts = []
    for _t in range(trials):
        t0 = time.perf_counter()
        o = args[0]
        for _ in range(reps):
            o = f(o, *args[1:])
        _ = np.asarray(o[0, 0, 0, :1])
        dts.append((time.perf_counter() - t0) / reps)
    return min(dts) * 1e3


def build(kernel_body):
    spec = pl.BlockSpec((1, 3, S, S), lambda i, *_: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)

    def f(imgs, slots, params):
        return pl.pallas_call(
            kernel_body,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=(B,), in_specs=[spec],
                out_specs=spec),
            out_shape=jax.ShapeDtypeStruct(imgs.shape, imgs.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(slots, params, imgs)

    return jax.jit(f)


def k_copy_loop(ops_ref, params_ref, img_ref, out_ref):
    out_ref[0] = img_ref[0]

    def step(k, c):
        return c

    jax.lax.fori_loop(0, K, step, 0)


def k_when_noop(ops_ref, params_ref, img_ref, out_ref):
    b = pl.program_id(0)
    out_ref[0] = img_ref[0]

    def step(k, c):
        op = ops_ref[b, k]
        for slot in range(1, 8):
            @pl.when(op == 100 + slot)       # never taken
            def _():
                out_ref[0, 0, 0, 0] = 1.0
        return c

    jax.lax.fori_loop(0, K, step, 0)


def k_when_store(ops_ref, params_ref, img_ref, out_ref):
    b = pl.program_id(0)
    out_ref[0] = img_ref[0]

    def step(k, c):
        op = ops_ref[b, k]
        for slot in range(1, 8):
            @pl.when(op == 100 + slot)       # never taken
            def _():
                out_ref[0] = img_ref[0]
        return c

    jax.lax.fori_loop(0, K, step, 0)


def k_switch_unit(ops_ref, params_ref, img_ref, out_ref):
    """Full v2 math, but ONE lax.switch per step over unit-returning
    branches that store into out_ref (no value carried -> no tile copies,
    single dispatch instead of 7 guarded regions)."""
    b = pl.program_id(0)
    out_ref[0] = img_ref[0]

    def step(k, c):
        op = ops_ref[b, k]
        p = [params_ref[b, k, j] for j in range(pf.MAX_PARAM)]

        def mk(branch):
            def go():
                img = out_ref[0]
                out_ref[0] = jnp.clip(branch(img, p), 0.0, 1.0)
            return go

        def noop():
            pass

        jax.lax.switch(op, [
            noop, mk(pf._brightness), mk(pf._contrast), mk(pf._saturation),
            mk(pf._color), noop, mk(pf._tone), mk(pf._sharpness_roll),
            mk(pf._white)])
        return c

    jax.lax.fori_loop(0, K, step, 0)


if __name__ == "__main__":
    log(f"device: {jax.devices()[0]}")
    imgs, slots, params = make_workload([3, 4, 5, 6, 8, 9])
    ident = jnp.zeros_like(slots)
    for name, kern in [("copy_loop", k_copy_loop),
                       ("when_noop", k_when_noop),
                       ("when_store", k_when_store),
                       ("switch_unit", k_switch_unit)]:
        try:
            f = build(kern)
            t = timeit(f, imgs, slots, params)
            log(f"{name:<12} mixed  : {t:7.2f} ms/call "
                f"({B*K/t*1e3:8.0f} ops/s)")
            if name == "switch_unit":
                from t2onet_tpu.ops import bank

                @jax.jit
                def bank_chain(img, slots2, params2):
                    for k in range(slots2.shape[1]):
                        vids = jnp.where(slots2[:, k] == 0, 0,
                                         slots2[:, k] + 2)
                        img, _ = bank.execute_bank(img, vids, params2[:, k])
                    return img

                err = float(jnp.abs(f(imgs, slots, params)
                                    - bank_chain(imgs, slots, params)).max())
                log(f"switch_unit parity vs bank: {err:.2e}")
                for vid, nm in [(0, "identity"), (3, "brightness"),
                                (6, "color"), (8, "tone"), (9, "sharpness")]:
                    su = (ident if vid == 0 else pf.vocab_ops_to_slots(
                        jnp.full((B, K), vid, jnp.int32)))
                    tu = timeit(f, imgs, su, params)
                    log(f"switch_unit uniform {nm:<10}: {tu:7.2f} ms/call")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
