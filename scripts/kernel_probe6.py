"""Probe 6: is compute overlapping the HBM DMA in the chain pipeline?

chain_g1 measures ~= copy_floor + sum(branch costs): additive, which
means per-program compute is NOT hiding behind the grid's DMA streams
(or the floor itself is bandwidth-saturated and compute adds on top).

Variants (b128/512px):
  addN          out=img then N dummy RMW passes (out+=1) in a fori
                -> slope = per-pass cost, intercept vs copy floor
  addN_par      same with dimension_semantics=("parallel",)
  chain_par     production chain kernel + parallel grid semantics
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
    print(f"[probe6 +{time.perf_counter() - _T0:6.1f}s] {msg}", flush=True)


def make_workload(seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:S, 0:S].astype(np.float32) / (S - 1)
    base = np.stack([x, y, 0.5 * (x + y)], 0)
    imgs = np.clip(base[None] + rng.uniform(-0.2, 0.2, (B, 3, S, S))
                   .astype(np.float32), 0, 1)
    vocab_ids = rng.choice([3, 4, 5, 6, 8, 9], size=(B, K)).astype(np.int32)
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


def add_kernel(ops_ref, params_ref, img_ref, out_ref, *, n):
    out_ref[0] = img_ref[0]

    def step(k, c):
        out_ref[0] = out_ref[0] * 1.0000001 + 1e-7
        return c
    jax.lax.fori_loop(0, n, step, 0)


def make_add(n, parallel):
    spec = pl.BlockSpec((1, 3, S, S), lambda i, *_: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(B,), in_specs=[spec], out_specs=spec)
    cp = dict(vmem_limit_bytes=100 * 1024 * 1024)
    if parallel:
        cp["dimension_semantics"] = ("parallel",)

    @jax.jit
    def run(imgs, slots, params):
        return pl.pallas_call(
            functools.partial(add_kernel, n=n),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(imgs.shape, imgs.dtype),
            compiler_params=pltpu.CompilerParams(**cp),
        )(slots, params, imgs)
    return run


def make_chain_par():
    spec = pl.BlockSpec((1, 3, S, S), lambda i, *_: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(B,), in_specs=[spec], out_specs=spec)

    @jax.jit
    def run(imgs, slots, params):
        return pl.pallas_call(
            functools.partial(pf._chain_kernel, n_steps=K, use_roll=True),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(imgs.shape, imgs.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",)),
        )(slots, params, imgs)
    return run


def main():
    imgs, slots, params = make_workload()
    log(f"devices: {jax.devices()}")

    for par in (False, True):
        for n in (0, 5, 10, 20):
            t = timeit(make_add(n, par), imgs, slots, params)
            log(f"add{n}{'_par' if par else ''}: {t:.3f} ms")

    ref = jax.jit(pf.fused_chain)(imgs, slots, params)
    f = make_chain_par()
    out = f(imgs, slots, params)
    err = float(jnp.abs(out - ref).max())
    t = timeit(f, imgs, slots, params)
    log(f"chain_par: {t:.3f} ms -> {B*K/t*1e3:,.0f} ops/s (err {err:.1e})")
    t = timeit(jax.jit(pf.fused_chain), imgs, slots, params)
    log(f"chain production re-ref: {t:.3f} ms -> {B*K/t*1e3:,.0f} ops/s")


if __name__ == "__main__":
    main()
