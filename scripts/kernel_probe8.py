"""Probe 8: why does a curve vector-op cost ~25x a dummy-pass FMA?

All-tone chains (b128/512px/K5) with surgical variants of the tone
branch to isolate the expensive construct:

  knots_k       truncated min-form with k knots      -> cost vs op count
  const_coef    b_j replaced by immediates           -> SMEM-scalar broadcast?
  fma_only      min(x, j/8) replaced by x*(j/8)      -> is min the cost?
  mul_chain     pure dependent FMA chain, 15 deep    -> dummy-pass parity
  no_switch     full min-form, NO lax.switch         -> cond-region penalty?
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
    print(f"[probe8 +{time.perf_counter() - _T0:6.1f}s] {msg}", flush=True)


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


def make(tone_fn, use_switch=True):
    def kernel(ops_ref, params_ref, img_ref, out_ref):
        b = pl.program_id(0)
        out_ref[0] = img_ref[0]

        def step(k, c):
            op = ops_ref[b, k]
            plist = [params_ref[b, k, j] for j in range(24)]

            def tone_go():
                img = out_ref[0]
                out_ref[0] = jnp.clip(tone_fn(img, plist), 0.0, 1.0)

            def noop():
                pass

            if use_switch:
                jax.lax.switch(op, [noop, noop, noop, noop, noop, noop,
                                    tone_go, noop, noop])
            else:
                tone_go()
            return c

        jax.lax.fori_loop(0, K, step, 0)

    spec = pl.BlockSpec((1, 3, S, S), lambda i, *_: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(B,), in_specs=[spec], out_specs=spec)

    @jax.jit
    def run(imgs, slots, params):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(imgs.shape, imgs.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(slots, params, imgs)
    return run


def knots(n):
    def f(x, p):
        csum = 1e-10
        for i in range(8):
            csum = csum + p[i]
        s = 8.0 / csum
        out = (s * p[7]) * x
        for j in range(1, n + 1):
            out = out - (s * (p[j] - p[j - 1])) * jnp.minimum(x, j / 8.0)
        return out
    return f


def const_coef(x, p):
    out = 1.05 * x
    for j in range(1, 8):
        out = out - 0.01 * jnp.minimum(x, j / 8.0)
    return out


def fma_only(x, p):
    csum = 1e-10
    for i in range(8):
        csum = csum + p[i]
    s = 8.0 / csum
    out = (s * p[7]) * x
    for j in range(1, 8):
        out = out - (s * (p[j] - p[j - 1])) * (x * (j / 8.0))
    return out


def mul_chain(x, p):
    out = x
    for j in range(15):
        out = out * 1.0000001 + 1e-7
    return out


def main():
    log(f"devices: {jax.devices()}")
    imgs, slots, params = make_workload()

    for n in (0, 1, 3, 5, 7):
        t = timeit(make(knots(n)), imgs, slots, params)
        log(f"knots_{n}: {t:.3f} ms")
    for name, fn in (("const_coef", const_coef), ("fma_only", fma_only),
                     ("mul_chain", mul_chain)):
        t = timeit(make(fn), imgs, slots, params)
        log(f"{name}: {t:.3f} ms")
    t = timeit(make(knots(7), use_switch=False), imgs, slots, params)
    log(f"no_switch full: {t:.3f} ms")
    t = timeit(make(mul_chain, use_switch=False), imgs, slots, params)
    log(f"no_switch mul_chain: {t:.3f} ms")


if __name__ == "__main__":
    main()
