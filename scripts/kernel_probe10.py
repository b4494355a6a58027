"""Probe 10: uint8-wire chain kernel.

Probes 6-9 settled the model: total ~= bytes/300GB/s + vpu_ops/0.9e12,
with NO DMA/compute overlap on this chip (plain XLA behaves the same).
Compute is at the VPU issue floor (min-form curve = 2 ops/knot; acc
splits and select-trees measured slower). The remaining lever is BYTES:
images are uint8 in every real pipeline (JPEG in, JPEG/serving out), so
a u8 wire cuts DMA 4x: 2.5 ms -> ~0.7 ms.

Variants (b128/512px/K5):
  u8_copy       u8 in -> f32 convert -> quantize -> u8 out (floor)
  u8_chain      full mixed chain on the u8 wire
  u8_chain_est  + Estrin contrast poly
Parity: bank on the SAME u8/255 inputs; kernel byte must equal the
bank's save_img byte (trunc(clip*255)) within 1 LSB on <0.1% of pixels
(fp rounding at bucket boundaries), exactly 0 bytes off elsewhere.
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
from t2onet_tpu.ops import bank  # noqa: E402

B, S, K = 128, 512, 5
_T0 = time.perf_counter()


def log(msg):
    print(f"[probe10 +{time.perf_counter() - _T0:6.1f}s] {msg}", flush=True)


def make_workload(seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:S, 0:S].astype(np.float32) / (S - 1)
    base = np.stack([x, y, 0.5 * (x + y)], 0)
    imgs = np.clip(base[None] + rng.uniform(-0.2, 0.2, (B, 3, S, S))
                   .astype(np.float32), 0, 1)
    imgs_u8 = (imgs * 255).round().astype(np.uint8)
    vocab_ids = rng.choice([3, 4, 5, 6, 8, 9], size=(B, K)).astype(np.int32)
    params = rng.uniform(0.1, 0.6, size=(B, K, 24)).astype(np.float32)
    slots = pf.vocab_ops_to_slots(jnp.asarray(vocab_ids))
    return (jnp.asarray(imgs_u8), slots, jnp.asarray(params))


def timeit(f, *args, reps=20, trials=3):
    out = f(*args)
    _ = np.asarray(out[0, 0, 0, :1])
    dts = []
    for _t in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(*args)
        _ = np.asarray(o[0, 0, 0, :1])
        dts.append((time.perf_counter() - t0) / reps)
    return min(dts) * 1e3


def contrast_estrin(img, p):
    lum = jnp.clip(0.27 * img[0] + 0.67 * img[1] + 0.06 * img[2], 0.0, 1.0)
    u = lum - 0.5
    v = u * u
    w = v * v
    C = pf._SINPI_C
    acc = (C[0] + C[1] * v) + w * ((C[2] + C[3] * v)
                                   + w * (C[4] + C[5] * v))
    clum = (acc * u) * 0.5 + 0.5
    ratio = clum / (lum + 1e-6)
    k = (1.0 - p[0]) + p[0] * ratio
    return img * k[None]


def u8_kernel(ops_ref, params_ref, img_ref, out_ref, *, n_steps, estrin,
              chain):
    b = pl.program_id(0)

    # u8 -> f32 working copy in VMEM scratch? No: keep the working image
    # as a kernel-local loop carry is impossible (refs only) — use a f32
    # scratch ref.
    pass


def make_u8(n_steps, estrin=False, do_chain=True):
    contrast = contrast_estrin if estrin else pf._contrast

    def kernel(ops_ref, params_ref, img_ref, out_ref, work_ref):
        b = pl.program_id(0)
        # Mosaic has no direct u8<->f32 casts; hop through int32
        work_ref[0] = img_ref[0].astype(jnp.int32).astype(
            jnp.float32) * (1.0 / 255.0)

        if do_chain:
            def step(k, c):
                op = ops_ref[b, k]

                def mk(branch):
                    def go():
                        img = work_ref[0]
                        plist = [params_ref[b, k, j] for j in range(24)]
                        work_ref[0] = jnp.clip(branch(img, plist), 0.0, 1.0)
                    return go

                def noop():
                    pass

                jax.lax.switch(op, [noop, mk(pf._brightness), mk(contrast),
                                    mk(pf._saturation), mk(pf._color), noop,
                                    mk(pf._tone), mk(pf._sharpness_roll),
                                    mk(pf._white)])
                return c

            jax.lax.fori_loop(0, n_steps, step, 0)
        # save_img quantization: trunc(clip(x)*255); work is already
        # clipped by the last step (or the initial convert for K=0)
        out_ref[0] = (work_ref[0] * 255.0).astype(jnp.int32).astype(
            jnp.uint8)

    img_spec = pl.BlockSpec((1, 3, S, S), lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(B,), in_specs=[img_spec],
        out_specs=img_spec,
        scratch_shapes=[pltpu.VMEM((1, 3, S, S), jnp.float32)])

    @jax.jit
    def run(imgs_u8, slots, params):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(imgs_u8.shape, jnp.uint8),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(slots, params, imgs_u8)
    return run


def main():
    log(f"devices: {jax.devices()}")
    imgs_u8, slots, params = make_workload()

    f0 = make_u8(K, do_chain=False)
    t = timeit(f0, imgs_u8, slots, params)
    log(f"u8_copy (convert+quantize only): {t:.3f} ms")

    @jax.jit
    def bank_chain(img_u8, slots2, params2):
        img = img_u8.astype(jnp.float32) / 255.0
        for k in range(K):
            vocab_ids = jnp.where(slots2[:, k] == 0, 0, slots2[:, k] + 2)
            img, _ = bank.execute_bank(img, vocab_ids, params2[:, k])
        return (jnp.clip(img, 0, 1) * 255.0).astype(jnp.uint8)

    ref_u8 = np.asarray(bank_chain(imgs_u8, slots, params))

    for name, est in (("u8_chain", False), ("u8_chain_est", True)):
        f = make_u8(K, estrin=est)
        out = np.asarray(f(imgs_u8, slots, params))
        diff = np.abs(out.astype(np.int16) - ref_u8.astype(np.int16))
        frac_off = float((diff > 0).mean())
        log(f"{name}: byte-diff max {diff.max()}, frac>0 {frac_off:.2e}")
        t = timeit(f, imgs_u8, slots, params)
        log(f"{name}: {t:.3f} ms -> {B*K/t*1e3:,.0f} ops/s")


if __name__ == "__main__":
    main()
