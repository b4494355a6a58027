"""Config + CLI arg-mapping tests (reference defaults must survive)."""

from t2onet_tpu.config import Config, ModelConfig, OperatorConfig, TrainConfig
from t2onet_tpu.cli import common


def test_reference_defaults():
    """Defaults pinned to the reference options
    (fiveK_base_options.py:29-54, fiveK_train_options.py)."""
    m = ModelConfig()
    assert (m.encoder_max_len, m.decoder_max_len) == (17, 5)
    assert (m.hidden_size, m.word_vec_dim, m.n_layers) == (256, 300, 2)
    assert m.bidirectional and m.use_attention
    assert m.decoder_hidden == 512
    assert m.operator_fc_dim == 512
    assert (m.null_id, m.start_id, m.end_id, m.unk_id) == (0, 1, 2, 3)
    assert m.op_vocab_size == 11

    o = OperatorConfig()
    assert o.exposure_range == 3.5
    assert o.sharpness_range == 1.5
    assert o.brightness_range == 2.0
    assert o.curve_steps == 8
    assert o.tone_curve_range == (0.5, 2.0)
    assert o.color_curve_range == (0.90, 1.10)
    assert o.saturation_range == (-0.2, 0.8)

    t = TrainConfig()
    assert t.batch_size == 64
    assert t.learning_rate == 1e-3
    assert t.explore_prob == 0.05
    assert t.checkpoint_every == 1000


def test_args_to_config_round_trip():
    import argparse

    p = argparse.ArgumentParser()
    common.add_base_args(p)
    common.add_train_args(p)
    a = p.parse_args(["--hidden_size", "128", "--decoder_max_len", "8",
                      "--batch_size", "16"])
    cfg = common.args_to_config(a)
    assert cfg.model.hidden_size == 128
    assert cfg.model.decoder_max_len == 8
    assert cfg.model.decoder_hidden == 256
    assert cfg.train.batch_size == 16
    # json round trip
    assert "hidden_size" in cfg.to_json()


def test_config_hashable_for_jit():
    assert hash(Config()) == hash(Config())
    assert Config() == Config()
