"""Microbenchmark probes for the fused-chain Pallas kernel (VERDICT r3 #1).

Times the production kernel on per-branch-uniform workloads (one compile,
op ids are runtime data) and a set of kernel variants, to decompose the
25.9 ms/call mixed-workload time (BENCH_r03) into dispatch overhead, DMA,
and per-branch VPU cost — and to find the restructure that closes the
roofline gap.

Run on the real chip:  python scripts/kernel_probe.py [probe ...]
Probes: branches, grid, variants (default: all)
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

from t2onet_tpu.ops import pallas_fused as pf

B, S, K = 128, 512, 5
_T0 = time.perf_counter()


def log(msg):
    print(f"[probe +{time.perf_counter() - _T0:6.1f}s] {msg}", flush=True)


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
    _ = np.asarray(out[(0,) * (out.ndim - 1)][:1])   # force compile+run
    dts = []
    for _t in range(trials):
        t0 = time.perf_counter()
        o = args[0]
        for _ in range(reps):
            o = f(o, *args[1:])
        _ = np.asarray(o[(0,) * (o.ndim - 1)][:1])   # readback barrier
        dts.append((time.perf_counter() - t0) / reps)
    return min(dts) * 1e3   # ms


# ---------------------------------------------------------------------------
# probe 1: per-branch cost through the production kernel (ONE compile)
# ---------------------------------------------------------------------------

def probe_branches():
    f = jax.jit(pf.fused_chain)
    imgs, slots, params = make_workload([3, 4, 5, 6, 8, 9])
    t_mixed = timeit(f, imgs, slots, params)
    log(f"mixed                : {t_mixed:7.2f} ms/call   "
        f"({B * K / t_mixed * 1e3:8.0f} ops/s)")
    names = {0: "identity", 3: "brightness", 4: "contrast", 5: "saturation",
             6: "color", 8: "tone", 9: "sharpness", 10: "white"}
    for vid, name in names.items():
        _, slots_u, _ = make_workload([vid] if vid else [0])
        slots_u = (jnp.zeros_like(slots) if vid == 0
                   else pf.vocab_ops_to_slots(jnp.full((B, K), vid, jnp.int32)))
        t = timeit(f, imgs, slots_u, params)
        log(f"uniform {name:<12}: {t:7.2f} ms/call")


# ---------------------------------------------------------------------------
# probe 2: grid/program overhead — identity chains at different block sizes
# ---------------------------------------------------------------------------

def _ident_kernel(ops_ref, params_ref, img_ref, out_ref):
    out_ref[...] = img_ref[...]


def ident_chain(nimg_per_prog):
    def f(imgs, slots, params):
        b = imgs.shape[0]
        g = b // nimg_per_prog
        spec = pl.BlockSpec((nimg_per_prog, 3, S, S),
                            lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _ident_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=(g,), in_specs=[spec],
                out_specs=spec),
            out_shape=jax.ShapeDtypeStruct(imgs.shape, imgs.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(slots, params, imgs)
    return jax.jit(f)


def probe_grid():
    imgs, slots, params = make_workload([3])
    for npp in (1, 2, 4):
        t = timeit(ident_chain(npp), imgs, slots, params)
        eff = 2 * imgs.nbytes / (t / 1e3) / 1e9
        log(f"identity copy, {B // npp:3d} programs x {npp} img: "
            f"{t:7.2f} ms/call  ({eff:5.0f} GB/s effective)")


# ---------------------------------------------------------------------------
# probe 3: kernel variants on the mixed workload
# ---------------------------------------------------------------------------

def _chain_kernel_unrolled(ops_ref, params_ref, img_ref, out_ref, *, n_steps):
    b = pl.program_id(0)
    img = img_ref[0]
    for k in range(n_steps):
        op = ops_ref[b, k]
        p = [params_ref[b, k, j] for j in range(pf.MAX_PARAM)]
        img = pf._apply_step(op, img, p, None)
    out_ref[0] = img


def chain_unrolled(imgs, slots, params):
    spec = pl.BlockSpec((1, 3, S, S), lambda i, *_: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_chain_kernel_unrolled, n_steps=K),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B,), in_specs=[spec],
            out_specs=spec),
        out_shape=jax.ShapeDtypeStruct(imgs.shape, imgs.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(slots, params, imgs)


def _chain_kernel_revisit(ops_ref, params_ref, img_ref, out_ref):
    """grid=(B,K): step k of image b; out block revisited across k so the
    image stays in VMEM; in block only read at k=0."""
    b, k = pl.program_id(0), pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[0] = img_ref[0]

    op = ops_ref[b, k]
    p = [params_ref[b, k, j] for j in range(pf.MAX_PARAM)]
    out_ref[0] = pf._apply_step(op, out_ref[0], p, None)


def chain_revisit(imgs, slots, params):
    spec = pl.BlockSpec((1, 3, S, S), lambda i, k, *_: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _chain_kernel_revisit,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B, K), in_specs=[spec],
            out_specs=spec),
        out_shape=jax.ShapeDtypeStruct(imgs.shape, imgs.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(slots, params, imgs)


def _chain_kernel_rows(ops_ref, params_ref, img_ref, out_ref, *, n_steps):
    """Row-blocked: grid (B, H/BH); sharpness halo IGNORED (perf probe)."""
    b = pl.program_id(0)

    def step(k, img):
        op = ops_ref[b, k]
        p = [params_ref[b, k, j] for j in range(pf.MAX_PARAM)]
        return pf._apply_step(op, img, p, None)

    out_ref[0] = jax.lax.fori_loop(0, n_steps, step, img_ref[0])


def chain_rows(bh):
    def f(imgs, slots, params):
        spec = pl.BlockSpec((1, 3, bh, S), lambda i, r, *_: (i, 0, r, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_chain_kernel_rows, n_steps=K),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=(B, S // bh), in_specs=[spec],
                out_specs=spec),
            out_shape=jax.ShapeDtypeStruct(imgs.shape, imgs.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(slots, params, imgs)
    return jax.jit(f)


def probe_variants():
    imgs, slots, params = make_workload([3, 4, 5, 6, 8, 9])
    for name, f in [("unrolled K", jax.jit(chain_unrolled)),
                    ("revisit (B,K) grid", jax.jit(chain_revisit)),
                    ("rows bh=128 (no halo)", chain_rows(128)),
                    ("rows bh=256 (no halo)", chain_rows(256))]:
        try:
            t = timeit(f, imgs, slots, params)
            log(f"{name:<22}: {t:7.2f} ms/call   "
                f"({B * K / t * 1e3:8.0f} ops/s)")
        except Exception as e:
            log(f"{name:<22}: FAILED {type(e).__name__}: {str(e)[:200]}")


PROBES = {"branches": probe_branches, "grid": probe_grid,
          "variants": probe_variants}

if __name__ == "__main__":
    which = sys.argv[1:] or list(PROBES)
    log(f"device: {jax.devices()[0]}")
    for w in which:
        log(f"--- {w} ---")
        PROBES[w]()
