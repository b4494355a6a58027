"""Probe 3: the v2 (pl.when in-place) chain kernel + episode-step
decomposition, in one run so a single tunnel-up window covers both.

Usage: python scripts/kernel_probe3.py [chain] [episode]
"""

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

from t2onet_tpu.ops import pallas_fused as pf  # noqa: E402

B, S, K = 128, 512, 5
_T0 = time.perf_counter()


def log(msg):
    print(f"[probe3 +{time.perf_counter() - _T0:6.1f}s] {msg}", flush=True)


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


def timeit(f, *args, reps=20, trials=3, readback=None, chain=True):
    out = f(*args)
    rb = readback or (lambda o: np.asarray(o[(0,) * (o.ndim - 1)][:1]))
    _ = rb(out)
    dts = []
    for _t in range(trials):
        t0 = time.perf_counter()
        o = args[0]
        for _ in range(reps):
            o = f(o, *args[1:]) if chain else f(*args)
        _ = rb(o)
        dts.append((time.perf_counter() - t0) / reps)
    return min(dts) * 1e3


def probe_chain():
    from t2onet_tpu.ops import bank

    f = jax.jit(pf.fused_chain)
    imgs, slots, params = make_workload([3, 4, 5, 6, 8, 9])

    # parity guard before timing
    @jax.jit
    def bank_chain(img, slots2, params2):
        for k in range(slots2.shape[1]):
            vocab_ids = jnp.where(slots2[:, k] == 0, 0, slots2[:, k] + 2)
            img, _ = bank.execute_bank(img, vocab_ids, params2[:, k])
        return img

    ref = bank_chain(imgs, slots, params)
    got = f(imgs, slots, params)
    err = float(jnp.abs(got - ref).max())
    log(f"v2 kernel-vs-bank max err: {err:.2e}")
    assert err < 1e-4, err

    t = timeit(f, imgs, slots, params)
    log(f"v2 mixed             : {t:7.2f} ms/call ({B*K/t*1e3:8.0f} ops/s)")
    for vid, name in [(0, "identity"), (3, "brightness"), (4, "contrast"),
                      (5, "saturation"), (6, "color"), (8, "tone"),
                      (9, "sharpness"), (10, "white")]:
        slots_u = (jnp.zeros_like(slots) if vid == 0
                   else pf.vocab_ops_to_slots(
                       jnp.full((B, K), vid, jnp.int32)))
        tu = timeit(f, imgs, slots_u, params)
        log(f"v2 uniform {name:<10}: {tu:7.2f} ms/call")


def probe_episode():
    """Decompose the 48.6 ms episode step (bench train_bench config:
    bs64, 128px): full step vs grad-free rollout vs phase proxies."""
    from t2onet_tpu.config import ModelConfig, OperatorConfig
    from t2onet_tpu.data.synthetic import SyntheticFiveK, synthetic_vocab
    from t2onet_tpu.models.actor import Actor
    from t2onet_tpu.train.loop import (create_train_state, make_episode_step,
                                       make_eval_episode,
                                       make_supervised_step)

    batch, size = 64, 128
    vocab = synthetic_vocab()
    cfg = ModelConfig(vis_bf16=True)
    actor = Actor(cfg=cfg, opcfg=OperatorConfig(), vocab_size=len(vocab))
    ds = SyntheticFiveK(n=batch, img_size=size, seed=0,
                        req_max_len=cfg.encoder_max_len,
                        op_max_len=cfg.decoder_max_len)
    b = next(ds.batches(batch_size=batch, steps=1, shuffle=False))
    jb = {k: jnp.asarray(v) for k, v in b.items() if k != "req"}
    sup_batch = {k: jb[k] for k in ("x", "y", "img_x", "img_y", "gt_params")}
    epi_batch = {"x": jb["x"], "img_x": jb["img_x"],
                 "gt_img": jb["img_y"][:, -1]}
    state = create_train_state(actor, jax.random.PRNGKey(0), jb["x"],
                               jb["img_x"])
    rng = jax.random.PRNGKey(1)
    log("episode: state ready")

    sup_step = make_supervised_step(actor, donate=False)
    epi_step = make_episode_step(actor, donate=False, pallas_exec=True)
    epi_step_bank = make_episode_step(actor, donate=False, pallas_exec=False)

    def rb_state(s):
        leaf = jax.tree_util.tree_leaves(s.params)[0]
        return np.asarray(leaf).ravel()[:1]

    t_sup = timeit(lambda s: sup_step(s, sup_batch)[0], state,
                   readback=rb_state)
    log(f"supervised step        : {t_sup:7.2f} ms/it")
    t_epi = timeit(lambda s: epi_step(s, epi_batch, rng)[0], state,
                   readback=rb_state)
    log(f"episode step (pallas)  : {t_epi:7.2f} ms/it")
    t_epib = timeit(lambda s: epi_step_bank(s, epi_batch, rng)[0], state,
                    readback=rb_state)
    log(f"episode step (bank)    : {t_epib:7.2f} ms/it")

    # grad-free rollout (the forward half)
    eval_fn = make_eval_episode(actor)
    t_fwd = timeit(lambda s: eval_fn(s, epi_batch)[0], state,
                   readback=lambda o: np.asarray(o).ravel()[:1],
                   chain=False)
    log(f"episode fwd only       : {t_fwd:7.2f} ms")

    # ResNet-only proxy: 5x vis-encode fwd+bwd at bs64 128px
    img = jb["img_x"]
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def res5(v, x):
        def loss(p):
            tot = 0.0
            for i in range(5):
                f = actor.apply(
                    {"params": p, "batch_stats": v["batch_stats"]},
                    x + i * 1e-4, False, method=Actor.vis_feat)
                tot = tot + (f ** 2).mean()
            return tot

        return jax.grad(loss)(v["params"])

    try:
        t_res = timeit(
            lambda v: {"params": res5(v, img),
                       "batch_stats": v["batch_stats"]}, variables,
            readback=lambda o: np.asarray(
                jax.tree_util.tree_leaves(o["params"])[0]).ravel()[:1])
        log(f"5x resnet fwd+bwd      : {t_res:7.2f} ms")
    except Exception as e:
        log(f"resnet proxy failed: {type(e).__name__} {str(e)[:150]}")


if __name__ == "__main__":
    which = sys.argv[1:] or ["chain", "episode"]
    log(f"device: {jax.devices()[0]}")
    for w in which:
        log(f"--- {w} ---")
        {"chain": probe_chain, "episode": probe_episode}[w]()
