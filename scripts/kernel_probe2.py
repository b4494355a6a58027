"""Probe 2: XLA-fused one-hot bank chain vs the Pallas kernel at the
bench workload (b128, 512px, K=5 mixed ops)."""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_t2onet"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_t2onet"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from t2onet_tpu.ops import bank  # noqa: E402
from t2onet_tpu.ops import pallas_fused as pf  # noqa: E402

B, S, K = 128, 512, 5
_T0 = time.perf_counter()


def log(msg):
    print(f"[probe2 +{time.perf_counter() - _T0:6.1f}s] {msg}", flush=True)


def make_workload(seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:S, 0:S].astype(np.float32) / (S - 1)
    base = np.stack([x, y, 0.5 * (x + y)], 0)
    imgs = np.clip(base[None] + rng.uniform(-0.2, 0.2, (B, 3, S, S))
                   .astype(np.float32), 0, 1)
    vocab_ids = rng.choice([3, 4, 5, 6, 8, 9], size=(B, K)).astype(np.int32)
    params = rng.uniform(0.1, 0.6, size=(B, K, 24)).astype(np.float32)
    return (jnp.asarray(imgs), jnp.asarray(vocab_ids),
            pf.vocab_ops_to_slots(jnp.asarray(vocab_ids)),
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


@jax.jit
def bank_chain(img, vocab_ids, params):
    for k in range(K):
        img, _ = bank.execute_bank(img, vocab_ids[:, k], params[:, k])
    return img


if __name__ == "__main__":
    log(f"device: {jax.devices()[0]}")
    imgs, vids, slots, params = make_workload()
    t = timeit(bank_chain, imgs, vids, params)
    log(f"one-hot bank chain (XLA): {t:7.2f} ms/call  "
        f"({B * K / t * 1e3:8.0f} ops/s)")
    f = jax.jit(pf.fused_chain)
    t2 = timeit(f, imgs, slots, params)
    log(f"pallas fused_chain      : {t2:7.2f} ms/call  "
        f"({B * K / t2 * 1e3:8.0f} ops/s)")
