"""Shared CLI plumbing: args -> Config, model construction, scalar logging.

Replaces the reference's options/ argparse class hierarchy
(fiveK_base_options.py / seq2seqGAN_*): same knobs, same defaults, one
flat parser per entry point.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from t2onet_tpu.config import Config, ModelConfig, OperatorConfig, TrainConfig


def maybe_force_cpu(a):
    """Apply --cpu before any backend client exists (the machine
    sitecustomize pins the TPU backend via JAX_PLATFORMS=axon)."""
    import jax

    if getattr(a, "cpu", False):
        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()


def enable_compile_cache():
    """Persistent XLA compile cache for every CLI entry point.

    The reference pays its CUDA autotune/compile on every process start;
    here a whole-train-step or planner-fit XLA compile is tens of seconds
    on TPU (minutes through a degraded tunnel) and is identical across
    restarts — exactly the case jax's persistent cache exists for. Makes
    crash-resume (cli/train_supervisor.py), plan_fleet worker fan-out,
    and repeated demo/serve/eval invocations start in seconds.
    Override the location with T2ONET_COMPILE_CACHE=<dir>; disable with
    T2ONET_COMPILE_CACHE=0.
    """
    import jax

    loc = os.environ.get("T2ONET_COMPILE_CACHE")
    if loc == "0":
        return
    jax.config.update("jax_compilation_cache_dir",
                      loc or os.path.expanduser("~/.cache/jax_t2onet"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def add_base_args(p: argparse.ArgumentParser):
    p.add_argument("--cpu", action="store_true",
                   help="run on the CPU backend (tests / no-TPU hosts)")
    # run / data (reference fiveK_base_options.py:13-27)
    p.add_argument("--dataset", default="FiveK")
    p.add_argument("--run_dir", default=None)
    p.add_argument("--trial", type=int, default=1)
    p.add_argument("--session", type=int, default=1)
    p.add_argument("--action_id", type=int, default=1)
    p.add_argument("--act_dir", default=None,
                   help="planner actions dir (default output/actions_set_N)")
    p.add_argument("--data_dir", default="data",
                   help="root holding FiveK/, GIER/, language/")
    p.add_argument("--manual_seed", type=int, default=10)
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic dataset (no image files needed)")
    p.add_argument("--synthetic_n", type=int, default=512)
    p.add_argument("--img_size", type=int, default=128)
    # model (reference fiveK_base_options.py:30-45)
    p.add_argument("--encoder_max_len", type=int, default=17)
    p.add_argument("--decoder_max_len", type=int, default=5)
    p.add_argument("--hidden_size", type=int, default=256)
    p.add_argument("--word_vec_dim", type=int, default=300)
    p.add_argument("--use_attention", type=int, default=1)
    p.add_argument("--bidirectional", type=int, default=1)
    p.add_argument("--n_layers", type=int, default=2)
    p.add_argument("--operator_fc_dim", type=int, default=512)
    p.add_argument("--fix_input_embedding", type=int, default=1,
                   help="freeze GloVe word rows, train only the 4 special "
                        "rows (reference default, seq2seqGAN_train_options"
                        ".py:39; auto-downgraded to 0 when no GloVe "
                        "embedding is loaded)")
    p.add_argument("--discrete_param", type=int, default=0,
                   help="classify op params over discrete_step bins "
                        "(reference fiveK_base_options discrete_param)")
    p.add_argument("--discrete_step", type=int, default=10)
    p.add_argument("--resnet_widths", default=None,
                   help="comma-separated ResNet stage widths (default "
                        "64,128,256,512 — the reference's actor_resnet "
                        "sizes); shrink for tiny smoke runs")
    p.add_argument("--vis_feat_dim", type=int, default=None,
                   help="vis-encoder output feature dim (default 512); "
                        "must equal the last resnet width")
    p.add_argument("--vis_bf16", type=int, default=0,
                   help="vis-encoder (ResNet) computation in bfloat16 — "
                        "params/batch-stats stay f32; halves the per-step "
                        "activation HBM traffic of the hot vis-encode. "
                        "Off by default (reference-exact f32 numerics)")
    # operator ranges (reference fiveK_base_options.py:48-54)
    p.add_argument("--exposure_range", type=float, default=3.5)
    p.add_argument("--sharpness_range", type=float, default=1.5)
    p.add_argument("--brightness_range", type=float, default=2.0)
    p.add_argument("--curve_steps", type=int, default=8)
    return p


def add_train_args(p: argparse.ArgumentParser):
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_iters", type=int, default=10_000)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--explore_prob", type=float, default=0.05)
    p.add_argument("--print_every", type=int, default=100)
    p.add_argument("--checkpoint_every", type=int, default=1000)
    p.add_argument("--val_batches", type=int, default=8,
                   help="validation batches per checkpoint; 0 skips "
                        "in-training validation (checkpoints still saved, "
                        "no best tracking)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max_keep_ckpts", type=int, default=0,
                   help="prune all but the newest N step checkpoints "
                        "(0 keeps everything, the reference behavior)")
    return p


def args_to_config(a) -> Config:
    model = ModelConfig(
        encoder_max_len=a.encoder_max_len, decoder_max_len=a.decoder_max_len,
        hidden_size=a.hidden_size, word_vec_dim=a.word_vec_dim,
        n_layers=a.n_layers, bidirectional=bool(a.bidirectional),
        use_attention=bool(a.use_attention),
        operator_fc_dim=a.operator_fc_dim,
        fix_input_embedding=bool(a.fix_input_embedding),
        discrete_param=bool(getattr(a, "discrete_param", 0)),
        discrete_step=getattr(a, "discrete_step", 10),
        vis_bf16=bool(getattr(a, "vis_bf16", 0)),
        **({"resnet_widths": tuple(
            int(x) for x in a.resnet_widths.split(","))}
           if getattr(a, "resnet_widths", None) else {}),
        **({"vis_feat_dim": a.vis_feat_dim}
           if getattr(a, "vis_feat_dim", None) else {}))
    ops = OperatorConfig(
        exposure_range=a.exposure_range, sharpness_range=a.sharpness_range,
        brightness_range=a.brightness_range, curve_steps=a.curve_steps)
    train = TrainConfig(
        batch_size=getattr(a, "batch_size", 64),
        num_iters=getattr(a, "num_iters", 10_000),
        learning_rate=getattr(a, "learning_rate", 1e-3),
        explore_prob=getattr(a, "explore_prob", 0.05),
        print_every=getattr(a, "print_every", 100),
        checkpoint_every=getattr(a, "checkpoint_every", 1000),
        train_img_size=a.img_size, seed=a.manual_seed)
    return Config(operators=ops, model=model, train=train,
                  dataset=a.dataset, session=a.session)


def resolve_run_dir(a, record: bool = True) -> str:
    """record=False for read-only CLIs (demo/test/serve): they must not
    overwrite the opt.json that documents the flags which PRODUCED the
    run dir's checkpoints (the only record of the model geometry)."""
    run_dir = a.run_dir or f"output/{a.dataset}_trial_{a.trial}"
    os.makedirs(run_dir, exist_ok=True)
    if record:
        with open(os.path.join(run_dir, "opt.json"), "w") as f:
            json.dump(vars(a), f, indent=2, default=str)
    return run_dir


def build_vocab_only(a):
    """(vocab2id, id2op_vocab, word2vec or None) WITHOUT touching dataset
    annotations/images — for CLIs like demo that edit a user-supplied
    image and need only tokenization (reference demo/seq2seqL1.py loads
    just the vocab files)."""
    if a.synthetic:
        from t2onet_tpu.data.synthetic import synthetic_vocab

        return synthetic_vocab(), _default_id2op(), None
    from t2onet_tpu.data.text import load_vocab, load_embedding

    vocab_dir = os.path.join(a.data_dir, "language")
    vocab2id, _, _, id2op = load_vocab(vocab_dir, a.dataset, a.session)
    glove_path = os.path.join(
        vocab_dir, f"{a.dataset}_vocabs_glove_feat_{a.session}.h5")
    w2v = load_embedding(glove_path) if os.path.exists(glove_path) else None
    return vocab2id, id2op, w2v


def build_dataset_and_vocab(a, phase: str = "train",
                            eval_img_mode: str = "native",
                            wire_u8: bool = False):
    """Returns (dataset, vocab2id, id2op_vocab, word2vec or None).

    eval_img_mode (val/test phases only): 'native' keeps the reference's
    short-side-600 variable-shape images (batch_size must be 1 — shapes
    differ per sample); 'train_size' loads square train-resolution images
    so in-training validation can batch under one compiled shape.

    wire_u8=True (file-backed train datasets; GIER masks stay float32):
    emit images as uint8 CHW so the host cache and H2D wire carry 1/4
    the bytes; consumers must normalize on device
    (data/loader.device_put_batch does). Within 1 ulp of the float path
    — see data/fivek.load_train_img."""
    if a.synthetic:
        from t2onet_tpu.data.synthetic import SyntheticFiveK, synthetic_vocab

        vocab2id = synthetic_vocab()
        n = a.synthetic_n if phase == "train" else max(a.synthetic_n // 8, 16)
        seed = {"train": 0, "val": 1, "test": 2}[phase]
        ds = SyntheticFiveK(n=n, img_size=a.img_size, seed=seed,
                            req_max_len=a.encoder_max_len,
                            op_max_len=a.decoder_max_len)
        id2op = _default_id2op()
        return ds, vocab2id, id2op, None

    from t2onet_tpu.data.text import load_vocab, load_embedding

    vocab_dir = os.path.join(a.data_dir, "language")
    vocab2id, _, _, id2op = load_vocab(vocab_dir, a.dataset, a.session)
    if a.dataset == "GIER":
        from t2onet_tpu.data.gier import GIERDataset, GIERDatasetAct

        if phase == "train":
            import numpy as np

            act_dir = a.act_dir or f"output/GIER_actions_set_{a.action_id}"
            ds = GIERDatasetAct(
                os.path.join(a.data_dir, "GIER"), vocab_dir, act_dir, phase,
                data_mode=getattr(a, "data_mode", "global"),
                is_load_mask=bool(getattr(a, "is_load_mask", 0)),
                session=a.session, train_img_size=a.img_size,
                wire_dtype=np.uint8 if wire_u8 else np.float32)
        else:
            # planner actions exist for train only — val/test evaluate on
            # plain request/pair items (reference test_GIER_seq2seqL1.py
            # builds the non-Act dataset for eval)
            ds = GIERDataset(
                os.path.join(a.data_dir, "GIER"), vocab_dir, phase,
                data_mode=getattr(a, "data_mode", "global"),
                is_load_mask=False, session=a.session,
                train_img_size=a.img_size, eval_img_mode=eval_img_mode)
    else:
        from t2onet_tpu.data.fivek import FiveK, FiveKAct

        img_dir = os.path.join(a.data_dir, "FiveK", "images")
        anno_dir = os.path.join(a.data_dir, "FiveK", "annotations")
        act_dir = a.act_dir or f"output/actions_set_{a.action_id}"
        import numpy as np

        wd = np.uint8 if wire_u8 else np.float32
        if phase == "train":
            # planner actions exist for the train split only (reference:
            # val/test use the plain pair dataset, train_seq2seqL1.py:154-157)
            ds = FiveKAct(img_dir, anno_dir, act_dir, phase, a.session,
                          a.img_size, op_max_len=a.decoder_max_len,
                          wire_dtype=wd)
        else:
            ds = FiveK(img_dir, anno_dir, phase, a.session, a.img_size,
                       eval_img_mode=eval_img_mode, wire_dtype=wd)
    glove_path = os.path.join(
        vocab_dir, f"{a.dataset}_vocabs_glove_feat_{a.session}.h5")
    w2v = load_embedding(glove_path) if os.path.exists(glove_path) else None
    return ds, vocab2id, id2op, w2v


def _default_id2op():
    names = ["<NONE>", "<START>", "<END>", "brightness", "contrast",
             "saturation", "hue", "inpaint_obj", "tint", "sharpness",
             "color_bg"]
    return {i: n for i, n in enumerate(names)}


def build_actor(a, vocab_size: int, word2vec=None):
    from t2onet_tpu.models.actor import Actor

    cfg = args_to_config(a)
    if cfg.model.fix_input_embedding and word2vec is None:
        # freezing random-init word rows would make the encoder
        # untrainable; the reference only ever freezes real GloVe rows
        import dataclasses
        import warnings

        warnings.warn("--fix_input_embedding 1 without a GloVe embedding: "
                      "downgrading to 0 (nothing pretrained to freeze)")
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           fix_input_embedding=False))
    return Actor(cfg=cfg.model, opcfg=cfg.operators, vocab_size=vocab_size,
                 word2vec=None if word2vec is None else np.asarray(word2vec),
                 explore_prob=getattr(a, "explore_prob", 0.05)), cfg


class ScalarLogger:
    """JSONL scalar log (+ optional TensorBoard if available) — replaces
    the reference's SummaryWriter usage (train_seq2seqL1.py:37-38)."""

    def __init__(self, run_dir: str, name: str = "metrics"):
        self.path = os.path.join(run_dir, f"{name}.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=os.path.join(run_dir, "runs"))
        except Exception:
            pass

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
