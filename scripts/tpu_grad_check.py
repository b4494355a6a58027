"""On-chip gradient parity: fused_step (Pallas custom VJP) vs the
differentiable one-hot bank, on the REAL TPU.

The CPU suite checks this in interpret mode only; Mosaic lowering can
differ (round 4: SMEM scalar stores inside switch branches silently
produced nan grads on TPU while interpret mode was exact). Run this
after ANY kernel change:  python scripts/tpu_grad_check.py
"""

import os
import sys

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
from t2onet_tpu.ops.pallas_fused import fused_step, vocab_ops_to_slots  # noqa: E402


def main(b=16, size=64, seed=0):
    rng = np.random.default_rng(seed)
    imgs_np = rng.uniform(0, 1, (b, 3, size, size)).astype(np.float32)
    # singular-point coverage: black pixels (v=0), gray pixels (v=min,
    # s=0), saturated-white — the round-4 saturation-VJP underflow was
    # data-dependent and invisible to uniform-random images
    imgs_np[:, :, :8, :8] = 0.0
    imgs_np[:, :, 8:16, :8] = 0.5
    imgs_np[:, :, :8, 8:16] = 1.0
    imgs = jnp.asarray(imgs_np)
    # every slot represented incl. specials/inpaint
    vids = jnp.asarray(
        rng.choice([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10], size=(b,))
        .astype(np.int32))
    params = jnp.asarray(rng.uniform(0.05, 0.7, (b, 24)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(0, 1, (b, 1, size, size)) > 0.4)
                       .astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (b, 3, size, size))
                      .astype(np.float32))
    slots = vocab_ops_to_slots(vids)

    for name, m in [("unmasked", None), ("masked", mask)]:
        def loss_pallas(im, p):
            out = fused_step(im, slots, p, mask=m)
            return (jnp.abs(out - tgt)).mean()

        def loss_bank(im, p):
            out, _ = bank.execute_bank(im, vids, p, mask=m)
            return (jnp.abs(out - tgt)).mean()

        lp, (gp_i, gp_p) = jax.jit(jax.value_and_grad(
            loss_pallas, argnums=(0, 1)))(imgs, params)
        lb, (gb_i, gb_p) = jax.jit(jax.value_and_grad(
            loss_bank, argnums=(0, 1)))(imgs, params)
        e_l = abs(float(lp) - float(lb))
        e_i = float(jnp.abs(gp_i - gb_i).max())
        e_p = float(jnp.abs(gp_p - gb_p).max())
        fin = bool(jnp.isfinite(gp_i).all() and jnp.isfinite(gp_p).all())
        print(f"[{name}] loss err {e_l:.2e}  d_img err {e_i:.2e}  "
              f"d_param err {e_p:.2e}  finite={fin}", flush=True)
        assert fin, f"{name}: non-finite pallas grads"
        assert e_l < 1e-5 and e_i < 1e-4 and e_p < 1e-3, (e_l, e_i, e_p)
    print("TPU grad parity OK")


if __name__ == "__main__":
    main()
