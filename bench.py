"""Headline benchmark: 512px operator applications / sec / chip.

Measures the hot path of the framework — executing K-step sequences of
editing operators on 512x512 RGB images via the fused Pallas chain kernel
(t2onet_tpu/ops/pallas_fused.py: one HBM read+write per image per chain,
only the selected op branch computed per step) — against the BASELINE.json
north star (>= 10,000 512px op applications/sec/chip).

Timing is readback-forced: N chained kernel calls (each consuming the
previous output) followed by a single device->host readback, so async
dispatch can't fake the number and the host<->device round-trip is
amortized across the chain. (block_until_ready through the axon tunnel
returns early; a data-dependent readback is the only honest barrier.)

Prints one JSON line PER METRIC on stdout (everything else on stderr):
first the training-step throughput, LAST the headline kernel line
  {"metric": "512px operator applications/sec/chip", "value": N,
   "unit": ..., "vs_baseline": N/10000}
so tail-line parsers read the headline metric.
"""

import json
import os
import time

import numpy as np

BASELINE_OPS_PER_SEC = 10_000.0

_T0 = time.perf_counter()


def _stage(msg):
    """Stage timing on stderr (stdout stays JSON-only): lets a slow run
    through the axon tunnel be diagnosed from the log alone."""
    import sys

    print(f"[bench +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _enable_compile_cache():
    """Persistent XLA compile cache (same dir as tests/conftest.py): the
    cold train-step + Pallas-VJP compiles through the axon tunnel take
    ~10 min; a warm run takes seconds. Must be set before backend init."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_t2onet"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def _device_peaks():
    """(hbm_GB/s, peak_bf16_FLOP/s) for the current chip — the roofline
    denominators. TPU v5e (v5 lite): 819 GB/s HBM, 197 TFLOP/s bf16
    (public spec, cloud.google.com/tpu/docs/v5e). Unknown chips (incl.
    the CPU test backend) return None: the roofline fields are omitted
    rather than computed against a wrong ceiling."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 819.0, 197e12
    if "v5p" in kind or "v5" in kind:
        return 2765.0, 459e12
    return None, None


def _step_flops(jitted, *args, **kwargs):
    """XLA's own FLOP count for one compiled step (cost_analysis), or
    None when the backend doesn't expose it."""
    try:
        ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def build_workload(batch=128, size=512, steps=5, seed=0):
    # batch 128 amortizes the per-call fixed cost (measured sweep on v5e:
    # 21.7k/22.1k/22.7k ops/s at b=32/64/128; b=256 exceeds the 1M SMEM
    # budget for the scalar-prefetched per-step params)
    import jax.numpy as jnp

    from t2onet_tpu.ops.pallas_fused import vocab_ops_to_slots

    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    base = np.stack([x, y, 0.5 * (x + y)], 0)
    imgs = np.clip(
        base[None] + rng.uniform(-0.2, 0.2, (batch, 3, size, size))
        .astype(np.float32), 0, 1)
    # mixed plan-ops per (image, step): vocab ids 3..9 excluding inpaint(7)
    vocab_ids = rng.choice([3, 4, 5, 6, 8, 9], size=(batch, steps)).astype(np.int32)
    params = rng.uniform(0.1, 0.6, size=(batch, steps, 24)).astype(np.float32)
    return (jnp.asarray(imgs), vocab_ops_to_slots(jnp.asarray(vocab_ids)),
            jnp.asarray(params))


def train_bench(batch=64, size=128, iters=10):
    """Training-step throughput at the config of record (bs 64, 128px,
    reference README.md:91): one jitted step per phase (supervised
    teacher-forced + episode end-to-end-L1 — the reference's alternating
    iteration pair, train_seq2seqL1.py:51-92), timed after compile.

    Prints one JSON line: ms/it per phase + images/s for the alternating
    pair."""
    import sys

    import jax
    import jax.numpy as jnp

    from t2onet_tpu.config import ModelConfig, OperatorConfig
    from t2onet_tpu.data.synthetic import SyntheticFiveK, synthetic_vocab
    from t2onet_tpu.models.actor import Actor
    from t2onet_tpu.train.loop import (create_train_state, make_episode_step,
                                       make_supervised_step)

    vocab = synthetic_vocab()
    # production TPU config: full config of record + bfloat16 vis-encoder
    # compute (params/BN stats stay f32). Convergence-validated on the
    # real chip: 400-iter synthetic A/B reaches val L1 0.0267 (bf16) vs
    # 0.0277 (f32) from init 0.0976 — equal-or-better at +27% throughput.
    # CPU keeps f32 (bf16 is emulated and slow off-TPU).
    on_tpu = jax.default_backend() == "tpu"
    cfg = ModelConfig(vis_bf16=on_tpu)
    actor = Actor(cfg=cfg, opcfg=OperatorConfig(), vocab_size=len(vocab))
    ds = SyntheticFiveK(n=batch, img_size=size, seed=0,
                        req_max_len=cfg.encoder_max_len,
                        op_max_len=cfg.decoder_max_len)
    b = next(ds.batches(batch_size=batch, steps=1, shuffle=False))
    jb = {k: jnp.asarray(v) for k, v in b.items() if k != "req"}
    sup_batch = {k: jb[k] for k in ("x", "y", "img_x", "img_y", "gt_params")}
    epi_batch = {"x": jb["x"], "img_x": jb["img_x"],
                 "gt_img": jb["img_y"][:, -1]}

    _stage("train_bench: data ready")
    state = create_train_state(actor, jax.random.PRNGKey(0), jb["x"],
                               jb["img_x"])
    _stage("train_bench: state init")
    sup_step = make_supervised_step(actor, donate=False)
    # production TPU config: episode ops through the fused Pallas step
    # kernel (custom VJP, selected branch fwd+bwd) — same gradients as
    # the one-hot bank, ~1.5x faster episode steps. Mosaic is TPU-only
    # (matches cli/train_fivek.py's auto gate; CPU uses the bank)
    pallas = on_tpu
    # production TPU config: probe-resolution episode rollout (decode at
    # 64px, execute/loss at 128px — Actor.episode probe_size, the
    # serve.py two-stage design applied to training). Convergence
    # A/B-gated on the real chip (round 5, data_real 1,280-pair
    # workspace, 400 iters, same seed): best val L1 0.0545 (probe 64)
    # vs 0.0610 (full-res) — equal-or-better at 2.25x episode speed
    # (35.9 -> 16.0 ms/it). CPU keeps the reference-exact full-res path.
    probe = 64 if on_tpu else None
    epi_step = make_episode_step(actor, donate=False, pallas_exec=pallas,
                                 probe_size=probe)
    rng = jax.random.PRNGKey(1)

    # compile + warmup
    state, m1 = sup_step(state, sup_batch)
    _ = float(m1["loss"])
    _stage("train_bench: supervised step compiled")
    state, m2 = epi_step(state, epi_batch, rng)
    _ = float(m2["L1_loss"])
    _stage("train_bench: episode step compiled")

    def time_phase(fn, *args):
        dts = []
        nonlocal state
        for _trial in range(3):
            t0 = time.perf_counter()
            m = None
            for _ in range(iters):
                state, m = fn(state, *args)
            _ = float(m[next(iter(m))])      # readback barrier
            dts.append((time.perf_counter() - t0) / iters)
        return min(dts)

    dt_sup = time_phase(sup_step, sup_batch)
    dt_epi = time_phase(epi_step, epi_batch, rng)
    _stage("train_bench: timed")
    imgs_per_sec = 2 * batch / (dt_sup + dt_epi)
    detail = {
        "sup_ms_per_it": round(dt_sup * 1e3, 2),
        "episode_ms_per_it": round(dt_epi * 1e3, 2),
        "episode_exec": "pallas_fused_step" if pallas else "onehot_bank",
        "vis_encoder": "bf16" if on_tpu else "f32",
        "episode_probe": probe or size,
        "batch": batch, "img": f"{size}x{size}x3 f32",
    }
    # MFU (VERDICT r2 item 8): XLA's own FLOP count per compiled step
    # over measured wall time, against the chip's bf16 peak. The model is
    # small and conv/LSTM-shaped (not one big GEMM), so single-digit MFU
    # is the honest expectation — the point is anchoring img/s to what
    # the silicon could theoretically do.
    f_sup = _step_flops(sup_step, state, sup_batch)
    f_epi = _step_flops(epi_step, state, epi_batch, rng)
    _, peak_flops = _device_peaks()
    if f_sup and f_epi and peak_flops:
        achieved = (f_sup + f_epi) / (dt_sup + dt_epi)
        detail.update({
            "flops_per_alternating_pair": round(f_sup + f_epi),
            "achieved_tflops": round(achieved / 1e12, 3),
            "mfu": round(achieved / peak_flops, 4),
            "peak_basis": "bf16 197 TFLOP/s (v5e)",
        })
    print(json.dumps({
        "metric": "train images/sec/chip (alternating fs+L1, bs64 128px)",
        "value": round(imgs_per_sec, 1),
        "unit": "img/s",
        "detail": detail,
    }), flush=True)
    return imgs_per_sec


def _backend_watchdog(timeout_s: float = 420.0):
    """Fail fast if the TPU backend never initializes.

    The axon tunnel goes down for hours at a time, and a dead tunnel makes
    jax backend init hang FOREVER (not error): a bench invocation would
    then produce no output at all. Watchdog: a daemon thread initializes
    the backend; if it hasn't come up within timeout_s, print a diagnostic
    and exit(2) so the caller records a clean failure instead of a hang."""
    import sys
    import threading

    done = threading.Event()
    info = {}

    def probe():
        import jax

        info["devices"] = list(jax.devices())
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        print(f"[bench] FATAL: jax backend did not initialize within "
              f"{timeout_s:.0f}s — TPU tunnel unreachable?", file=sys.stderr,
              flush=True)
        os._exit(2)
    _stage(f"backend up: {info['devices']}")


def main():
    _enable_compile_cache()
    _backend_watchdog()

    import jax
    import jax.numpy as jnp

    from t2onet_tpu.ops.pallas_fused import fused_chain

    import sys

    train_bench()

    imgs, slots, params = build_workload()
    f = jax.jit(fused_chain)
    _stage("chain: workload built")

    # warmup / compile (first Pallas compile through the tunnel is slow)
    out = f(imgs, slots, params)
    _ = np.asarray(out[0, 0, 0, :1])
    _stage("chain: kernel compiled")

    # guard the headline number with an on-device parity check vs the
    # differentiable jnp bank (report on stderr; stdout stays one JSON line)
    from t2onet_tpu.ops import bank

    @jax.jit                               # ONE dispatch, not 5 eager
    def bank_chain(img, slots2, params2):  # execute_bank calls through
        for k in range(slots2.shape[1]):   # the tunnel (RTT-bound)
            vocab_ids = jnp.where(slots2[:, k] == 0, 0, slots2[:, k] + 2)
            img, _ = bank.execute_bank(img, vocab_ids, params2[:, k])
        return img

    # full workload shapes: reuses f's one compiled executable (a [:2]
    # slice would trigger a second ~90s Mosaic compile through the tunnel)
    ref = bank_chain(imgs, slots, params)
    err = float(jnp.abs(f(imgs, slots, params) - ref).max())
    _stage("chain: parity checked")
    print(f"kernel-vs-bank max err: {err:.2e}", file=sys.stderr)
    assert err < 1e-4, f"fused kernel diverged from the op bank: {err}"

    n_rep = 30
    dts = []
    for _trial in range(3):                 # best-of-3: resist host noise
        t0 = time.perf_counter()
        out = imgs
        for _ in range(n_rep):
            out = f(out, slots, params)
        _ = np.asarray(out[0, 0, 0, :1])    # one readback forces the chain
        dts.append((time.perf_counter() - t0) / n_rep)
    dt = min(dts)

    batch, steps = imgs.shape[0], slots.shape[1]
    ops_per_sec = batch * steps / dt
    detail = {
        "batch": batch, "steps": steps, "img": "512x512x3 f32",
        "kernel": "pallas fused_chain",
        "ms_per_chain_call": round(dt * 1e3, 3),
        "device": str(jax.devices()[0]),
    }
    # HBM roofline context. The kernel's traffic contract is ONE read +
    # ONE write of the batch per chain call (image resident in VMEM
    # across all K steps). Round-5 probes (scripts/kernel_probe{5..10})
    # CORRECTED the r4 ceiling model: a tone chain with constant-block
    # index maps (no HBM traffic at all) runs in the SAME time as the
    # real chain, so the DMA is fully hidden and the kernel is purely
    # VPU-issue-bound (~0.086 ms per full-tile vector op at b128/512px;
    # min-form curve = 2 ops/knot is the op-count minimum). The old
    # "255k ops/s copy-floor ceiling" assumed the opposite regime
    # (DMA-bound, compute hidden) and is not a real bound; measured
    # no-gain-or-worse: multi-image blocks, parallel dimension
    # semantics, plain grid specs, uint8 wire (Mosaic u8<->f32 hops
    # through i32, ~1 ms of unpack), accumulator splits, select-tree
    # curves. The roofline_frac fields below are kept for continuity
    # but the binding resource is VPU issue rate, not HBM.
    hbm_gbps, _ = _device_peaks()
    if hbm_gbps:
        io_bytes = 2 * float(np.prod(imgs.shape)) * 4
        achieved_gbps = io_bytes / dt / 1e9
        detail.update({
            "io_bytes_per_chain_call": round(io_bytes),
            "achieved_hbm_gbps": round(achieved_gbps, 1),
            "hbm_peak_gbps": hbm_gbps,
            "roofline_frac": round(achieved_gbps / hbm_gbps, 4),
            "bw_bound_ceiling_ops_per_sec":
                round(batch * steps * hbm_gbps * 1e9 / io_bytes),
        })
    print(json.dumps({
        "metric": "512px operator applications/sec/chip",
        "value": round(ops_per_sec, 1),
        "unit": "ops/s",
        "vs_baseline": round(ops_per_sec / BASELINE_OPS_PER_SEC, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
