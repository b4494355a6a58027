"""Probe 9: is PrefetchScalarGridSpec serializing DMA vs compute?

Probe 8 showed chain time = copy_floor + compute (ADDITIVE): the grid
pipeline is not overlapping the 2.5 ms of block DMA with branch compute
(probe 6's "free passes" were a constant-folded affine chain — invalid).

Variants (b128/512px/K5 all-tone):
  copy_plain     out=img, plain pl.GridSpec, ops/params as SMEM blocks
  tone_plain     all-tone chain on the plain GridSpec
  tone_prefetch  all-tone on PrefetchScalarGridSpec (production form)
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
    print(f"[probe9 +{time.perf_counter() - _T0:6.1f}s] {msg}", flush=True)


def make_workload(seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:S, 0:S].astype(np.float32) / (S - 1)
    base = np.stack([x, y, 0.5 * (x + y)], 0)
    imgs = np.clip(base[None] + rng.uniform(-0.2, 0.2, (B, 3, S, S))
                   .astype(np.float32), 0, 1)
    slots = np.full((B, K), 6, np.int32)
    params = rng.uniform(0.1, 0.6, size=(B, K, 24)).astype(np.float32)
    return (jnp.asarray(imgs), jnp.asarray(slots), jnp.asarray(params))


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


def tone_step(out_ref, plist):
    img = out_ref[0]
    out_ref[0] = jnp.clip(pf._curve_1ch(img, plist), 0.0, 1.0)


def make_plain(do_tone):
    def kernel(ops_ref, params_ref, img_ref, out_ref):
        b = pl.program_id(0)
        out_ref[0] = img_ref[0]
        if do_tone:
            def step(k, c):
                op = ops_ref[b, k]

                def go():
                    tone_step(out_ref,
                              [params_ref[b, k, j] for j in range(24)])

                def noop():
                    pass

                jax.lax.switch(op, [noop] * 6 + [go] + [noop] * 2)
                return c
            jax.lax.fori_loop(0, K, step, 0)

    img_spec = pl.BlockSpec((1, 3, S, S), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    ops_spec = pl.BlockSpec(memory_space=pltpu.SMEM)   # whole array
    par_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    @jax.jit
    def run(imgs, slots, params):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[ops_spec, par_spec, img_spec],
            out_specs=img_spec,
            out_shape=jax.ShapeDtypeStruct(imgs.shape, imgs.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",)),
        )(slots, params, imgs)
    return run


def main():
    log(f"devices: {jax.devices()}")
    imgs, slots, params = make_workload()

    f = make_plain(False)
    t = timeit(f, imgs, slots, params)
    log(f"copy_plain: {t:.3f} ms")

    f = make_plain(True)
    ref = jax.jit(pf.fused_chain)(imgs, slots, params)
    out = f(imgs, slots, params)
    err = float(jnp.abs(out - ref).max())
    t = timeit(f, imgs, slots, params)
    log(f"tone_plain: {t:.3f} ms -> {B*K/t*1e3:,.0f} ops/s (err {err:.1e})")

    t = timeit(jax.jit(pf.fused_chain), imgs, slots, params)
    log(f"tone_prefetch (production): {t:.3f} ms")


if __name__ == "__main__":
    main()
