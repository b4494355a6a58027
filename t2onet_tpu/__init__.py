"""t2onet_tpu — a TPU-native language-guided global image editing framework.

Re-implements the capabilities of T2ONet ("Learning by Planning:
Language-Guided Global Image Editing") as an idiomatic JAX/XLA/Pallas
framework:

- `ops`      — differentiable image operator library (pure functions, NCHW,
               fused Pallas kernels for operator-sequence execution).
- `models`   — the seq2seq "actor": bi-LSTM language encoder, attention
               action decoder, ResNet vision encoder, all as compiled scans.
- `planner`  — on-device vmapped beam-search operation planning (the
               pseudo-ground-truth generator).
- `data`     — FiveK / GIER dataset readers, tokenizer, vocab, GloVe.
- `train`    — alternating supervised / end-to-end-L1 training with pjit
               data parallelism over a TPU mesh.
- `evals`    — L1 / SSIM / FID metric protocol and HTML galleries.
- `parallel` — mesh + sharding helpers.

Image convention everywhere: RGB float32 in [0, 1], NCHW (B, 3, H, W) —
matching the reference (reference: models/operators.py:30).
"""

__version__ = "0.1.0"
