"""Probe 7: TRUE per-branch compute costs (homogeneous 5-step chains).

Probe 6 showed the grid overlaps compute with DMA almost perfectly
(20 dummy RMW passes are free over the copy floor), so the mixed chain's
5.0 ms IS compute: true branch costs are ~2x the r4 "marginal" numbers
(those were half-hidden behind DMA). Here every step of every image runs
the SAME op: t = max(DMA_floor, 5 * c_op) exposes c_op directly.

Then micro-variants of the two dominant branches (curve, contrast).
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
    print(f"[probe7 +{time.perf_counter() - _T0:6.1f}s] {msg}", flush=True)


def make_workload(slot, seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:S, 0:S].astype(np.float32) / (S - 1)
    base = np.stack([x, y, 0.5 * (x + y)], 0)
    imgs = np.clip(base[None] + rng.uniform(-0.2, 0.2, (B, 3, S, S))
                   .astype(np.float32), 0, 1)
    slots = np.full((B, K), slot, np.int32)
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


SLOT_NAMES = {1: "brightness", 2: "contrast", 3: "saturation", 4: "color",
              6: "tone", 7: "sharpness", 8: "white"}


# --- curve variants -------------------------------------------------------

def curve_minform(x, p, off=0):
    return pf._curve_1ch(x, p, off)


def curve_4acc(x, p, off=0):
    """4 independent accumulator chains, summed at the end."""
    Sn = pf.CURVE_STEPS
    csum = 1e-10
    for i in range(Sn):
        csum = csum + p[off + i]
    s = Sn / csum
    terms = [(s * p[off + Sn - 1]) * x]
    for j in range(1, Sn):
        terms.append(-(s * (p[off + j] - p[off + j - 1]))
                     * jnp.minimum(x, j / Sn))
    a = (terms[0] + terms[4])
    b = (terms[1] + terms[5])
    c = (terms[2] + terms[6])
    d = (terms[3] + terms[7])
    return (a + b) + (c + d)


def curve_segment(x, p, off=0):
    """Reference clip-segment form (4 ops/knot) — sanity upper bound."""
    Sn = pf.CURVE_STEPS
    csum = 1e-10
    for i in range(Sn):
        csum = csum + p[off + i]
    s = Sn / csum
    out = jnp.zeros_like(x)
    for i in range(Sn):
        out = out + (s * p[off + i]) * jnp.clip(x - i / Sn, 0.0, 1.0 / Sn)
    return out


def make_chain_with(curve_fn, contrast_fn=None):
    def tone(img, p):
        return curve_fn(img, p)

    def color(img, p):
        return jnp.stack([curve_fn(img[c], p, off=c * 8) for c in range(3)])

    branches = [lambda i, p: i, pf._brightness,
                contrast_fn or pf._contrast, pf._saturation, color,
                lambda i, p: i, tone, pf._sharpness_roll, pf._white]

    def kernel(ops_ref, params_ref, img_ref, out_ref):
        b = pl.program_id(0)
        out_ref[0] = img_ref[0]

        def step(k, c):
            op = ops_ref[b, k]

            def mk(branch):
                def go():
                    img = out_ref[0]
                    plist = [params_ref[b, k, j] for j in range(24)]
                    out_ref[0] = jnp.clip(branch(img, plist), 0.0, 1.0)
                return go

            def noop():
                pass

            jax.lax.switch(op, [noop] + [mk(f) for f in branches[1:5]]
                           + [noop] + [mk(f) for f in branches[6:]])
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


def contrast_estrin(img, p):
    """Estrin-scheme cos poly: halved dependency depth."""
    lum = jnp.clip(0.27 * img[0] + 0.67 * img[1] + 0.06 * img[2], 0.0, 1.0)
    u = lum - 0.5
    v = u * u
    w = v * v
    C = pf._SINPI_C
    e0 = C[0] + C[1] * v
    e1 = C[2] + C[3] * v
    e2 = C[4] + C[5] * v
    acc = e0 + w * (e1 + w * e2)
    sin = acc * u                      # = sin(pi(x-1/2)) -> cos = -sin? no:
    clum = sin * 0.5 + 0.5             # -(-sin)*0.5+0.5 == sin*0.5+0.5
    ratio = clum / (lum + 1e-6)
    k = (1.0 - p[0]) + p[0] * ratio
    return img * k[None]


def main():
    log(f"devices: {jax.devices()}")
    prod = jax.jit(pf.fused_chain)

    for slot in (1, 2, 3, 4, 6, 7, 8):
        imgs, slots, params = make_workload(slot)
        t = timeit(prod, imgs, slots, params)
        log(f"all-{SLOT_NAMES[slot]}: {t:.3f} ms  (c_op ~ {(t - 0.2) / K:.3f})")

    # curve variants on the all-tone and all-color workloads
    for name, fn in (("minform", curve_minform), ("acc4", curve_4acc),
                     ("segment", curve_segment)):
        f = make_chain_with(fn)
        imgs, slots, params = make_workload(6)
        ref = prod(imgs, slots, params)
        err = float(jnp.abs(f(imgs, slots, params) - ref).max())
        t = timeit(f, imgs, slots, params)
        imgs2, slots2, params2 = make_workload(4)
        t2 = timeit(f, imgs2, slots2, params2)
        log(f"tone_{name}: {t:.3f} ms | color: {t2:.3f} ms (err {err:.1e})")

    # contrast variant
    f = make_chain_with(curve_minform, contrast_estrin)
    imgs, slots, params = make_workload(2)
    ref = prod(imgs, slots, params)
    err = float(jnp.abs(f(imgs, slots, params) - ref).max())
    t = timeit(f, imgs, slots, params)
    log(f"contrast_estrin: {t:.3f} ms (err {err:.1e})")


if __name__ == "__main__":
    main()
