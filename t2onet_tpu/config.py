"""Configuration for the t2onet_tpu framework.

Replaces the reference's argparse class hierarchy (reference: options/
fiveK_base_options.py:29-54, options/fiveK_train_options.py:10-44) with
frozen dataclasses so configs are hashable and can be closed over by jit.

Defaults mirror the reference's defaults exactly.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class OperatorConfig:
    """Parameter ranges of the differentiable operators.

    Reference: options/fiveK_base_options.py:48-54.
    """

    exposure_range: float = 3.5
    sharpness_range: float = 1.5
    brightness_range: float = 2.0
    curve_steps: int = 8
    tone_curve_range: Tuple[float, float] = (0.5, 2.0)
    color_curve_range: Tuple[float, float] = (0.90, 1.10)
    saturation_range: Tuple[float, float] = (-0.2, 0.8)
    # Maximum (padded) parameter vector length: color curve has 3*8 = 24.
    max_param: int = 24


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Seq2seq actor architecture.

    Reference: options/fiveK_base_options.py:30-45 and models/actor.py:37-76.
    """

    encoder_max_len: int = 17
    decoder_max_len: int = 5
    hidden_size: int = 256          # per-direction LSTM hidden
    word_vec_dim: int = 300
    n_layers: int = 2
    bidirectional: bool = True
    use_attention: bool = True
    operator_fc_dim: int = 512      # per-op parameter head fc1 width
    resnet_depth: int = 18
    vis_feat_dim: int = 512         # ResNet output feature (actor.py:75)
    # ResNet stage widths (reference actor_resnet.py:73-107 hardcodes
    # 64/128/256/512); overridable so tests/tiny deployments can shrink
    # the vis encoder without touching its depth/structure
    resnet_widths: Tuple[int, int, int, int] = (64, 128, 256, 512)
    # vis-encoder computation in bfloat16 (params/batch-stats stay f32):
    # halves per-step activation bandwidth on TPU; off by default to keep
    # reference-exact f32 numerics
    vis_bf16: bool = False
    input_dropout_p: float = 0.0
    dropout_p: float = 0.0
    fix_input_embedding: bool = False
    # discrete (classification) parameter mode: heads emit discrete_step
    # bin logits per scalar op instead of a regressed value (reference
    # fiveK_base_options.py discrete_param / discrete_step; default off,
    # matching the configs of record)
    discrete_param: bool = False
    discrete_step: int = 10

    @classmethod
    def tiny(cls, **overrides) -> "ModelConfig":
        """A structurally-complete but narrow config for smoke tests and
        dry runs: every architectural feature of the config of record
        (2-layer bidirectional LSTM, attention, 8-op heads, ResNet-18
        depth) at ~10-100x narrower widths. Used by tests/conftest.py's
        tiny_model_config and __graft_entry__.dryrun_multichip so the
        two can never drift apart."""
        kw = dict(hidden_size=16, word_vec_dim=16, operator_fc_dim=16,
                  vis_feat_dim=32, resnet_widths=(8, 8, 16, 16))
        kw.update(overrides)
        return cls(**kw)
    # Reference-exact batched attention: the reference's Attention has NO
    # length masking (models/attention.py:37-38) — padded positions up to
    # the batch-max request length hold zero encoder outputs (score 0)
    # and still receive softmax mass. Default False = attend only real
    # tokens (equivalent at batch size 1, the reference eval protocol;
    # strictly better batched). True reproduces the reference exactly
    # (used by scripts/parity_harness.py and batched-training parity).
    attend_batch_max: bool = False
    # vocab ids of special tokens (options/fiveK_train_options.py)
    null_id: int = 0
    start_id: int = 1
    end_id: int = 2
    unk_id: int = 3
    n_spec_token: int = 4
    # op vocab: <NONE> <START> <END> + 8 executor ops
    op_vocab_size: int = 11

    @property
    def decoder_hidden(self) -> int:
        """Decoder hidden = 2*hidden for bi-encoder (action_decoder.py:22-23)."""
        return self.hidden_size * (2 if self.bidirectional else 1)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters.

    Reference: options/fiveK_train_options.py and README training commands
    (batch 64, 10k iters FiveK / 20k GIER, Adam lr 1e-3).
    """

    batch_size: int = 64
    num_iters: int = 10_000
    learning_rate: float = 1e-3
    explore_prob: float = 0.05
    entropy_factor: float = 0.05
    print_every: int = 100
    checkpoint_every: int = 1000
    train_img_size: int = 128
    seed: int = 10
    # Declared-but-unused loss weights, kept for config parity: the
    # reference defines lam1/lam2 in every train-options file
    # (fiveK_train_options.py:21-22) but its trainers never apply them —
    # train_seq2seqL1.py:61 is a plain `op_loss + param_loss` and the
    # episode phase a plain L1. train/loop.py matches that actual
    # behavior; wiring these in would deviate from the reference runs.
    lam1: float = 1.0
    lam2: float = 5.0


@dataclasses.dataclass(frozen=True)
class Config:
    operators: OperatorConfig = OperatorConfig()
    model: ModelConfig = ModelConfig()
    train: TrainConfig = TrainConfig()
    dataset: str = "FiveK"
    session: int = 1
    vocab_size: int = 918           # FiveK sess-1 vocab (data/language)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def fivek_config(**overrides) -> Config:
    return dataclasses.replace(Config(), **overrides)


def gier_config(**overrides) -> Config:
    base = Config(dataset="GIER", session=3, vocab_size=3046)
    return dataclasses.replace(base, **overrides)
