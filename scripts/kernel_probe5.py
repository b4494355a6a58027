"""Probe 5 (round 5): attack the chain kernel's gap to the copy floor.

Hypothesis A: the 2.5 ms pure-copy floor at b128/512px is dominated by
per-program pipeline overhead (~12 us x 128 programs), not HBM DMA
(805 MB at 819 GB/s is only ~1 ms). If true, processing G images per
program cuts the floor ~G-fold toward the DMA bound.

Hypothesis B: the initial out=img full-tile copy (one VPU pass) can be
folded into step 0 by reading img_ref directly (identity branch then
stores the copy).

Variants (b128/512px/K5 mixed workload, same as bench.py):
  copy_g{1,2,4}   out=img copy + empty fori    -> floor vs G
  chain_g1        the production kernel        -> reference point
  chain_g{2,4}    G images per program, static g unroll
  chain_g2_s0     G=2 + step-0 reads img_ref (no init copy)
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
    print(f"[probe5 +{time.perf_counter() - _T0:6.1f}s] {msg}", flush=True)


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


# ---------------------------------------------------------------------------
# copy floor vs G
# ---------------------------------------------------------------------------

def copy_kernel_g(ops_ref, params_ref, img_ref, out_ref, *, g):
    for gi in range(g):
        out_ref[gi] = img_ref[gi]

    def step(k, c):
        return c
    jax.lax.fori_loop(0, K, step, 0)


def make_copy(g):
    spec = pl.BlockSpec((g, 3, S, S), lambda i, *_: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(B // g,), in_specs=[spec],
        out_specs=spec)

    @jax.jit
    def run(imgs, slots, params):
        return pl.pallas_call(
            functools.partial(copy_kernel_g, g=g),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(imgs.shape, imgs.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(slots, params, imgs)
    return run


# ---------------------------------------------------------------------------
# chain with G images per program (static g unroll)
# ---------------------------------------------------------------------------

def chain_kernel_g(ops_ref, params_ref, img_ref, out_ref, *, g, skip_init):
    b = pl.program_id(0)
    for gi in range(g):
        if not skip_init:
            out_ref[gi] = img_ref[gi]

        def step(k, c, gi=gi):
            op = ops_ref[b * g + gi, k]

            def params_fn(gi=gi, k=k):
                return [params_ref[b * g + gi, k, j] for j in range(24)]

            def finish(out, img):
                return jnp.clip(out, 0.0, 1.0)

            def mk(branch, gi=gi):
                def go():
                    img = out_ref[gi]
                    out_ref[gi] = finish(branch(img, params_fn()), img)
                return go

            def noop():
                pass

            jax.lax.switch(op, [noop, mk(pf._brightness), mk(pf._contrast),
                                mk(pf._saturation), mk(pf._color), noop,
                                mk(pf._tone), mk(pf._sharpness_roll),
                                mk(pf._white)])
            return c

        if skip_init:
            # step 0 reads img_ref (identity must copy), steps 1.. RMW out
            op0 = ops_ref[b * g + gi, 0]

            def params_fn0(gi=gi):
                return [params_ref[b * g + gi, 0, j] for j in range(24)]

            def mk0(branch, gi=gi):
                def go():
                    img = img_ref[gi]
                    out_ref[gi] = jnp.clip(branch(img, params_fn0()), 0.0,
                                           1.0)
                return go

            def copy0(gi=gi):
                out_ref[gi] = img_ref[gi]

            jax.lax.switch(op0, [copy0, mk0(pf._brightness),
                                 mk0(pf._contrast), mk0(pf._saturation),
                                 mk0(pf._color), copy0, mk0(pf._tone),
                                 mk0(pf._sharpness_roll), mk0(pf._white)])
            jax.lax.fori_loop(1, K, step, 0)
        else:
            jax.lax.fori_loop(0, K, step, 0)


def make_chain(g, skip_init=False):
    spec = pl.BlockSpec((g, 3, S, S), lambda i, *_: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(B // g,), in_specs=[spec],
        out_specs=spec)

    @jax.jit
    def run(imgs, slots, params):
        return pl.pallas_call(
            functools.partial(chain_kernel_g, g=g, skip_init=skip_init),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(imgs.shape, imgs.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(slots, params, imgs)
    return run


def main():
    imgs, slots, params = make_workload()
    log(f"devices: {jax.devices()}")

    ref = jax.jit(pf.fused_chain)(imgs, slots, params)
    _ = np.asarray(ref[0, 0, 0, :1])
    log("production kernel compiled")
    t = timeit(jax.jit(pf.fused_chain), imgs, slots, params)
    log(f"chain_g1 (production): {t:.3f} ms -> {B*K/t*1e3:,.0f} ops/s")

    for g in (1, 2, 4):
        f = make_copy(g)
        t = timeit(f, imgs, slots, params)
        log(f"copy_g{g}: {t:.3f} ms")

    for g, skip in ((2, False), (4, False), (2, True)):
        f = make_chain(g, skip)
        out = f(imgs, slots, params)
        err = float(jnp.abs(out - ref).max())
        t = timeit(f, imgs, slots, params)
        tag = f"chain_g{g}" + ("_s0" if skip else "")
        log(f"{tag}: {t:.3f} ms -> {B*K/t*1e3:,.0f} ops/s  (err {err:.1e})")


if __name__ == "__main__":
    main()
