"""Smoke tests for the evaluation CLIs (reference protocol:
experiments/t2onet/test_seq2seqL1.py / test_GIER_seq2seqL1.py).

These are the last PARITY rows without automated coverage: the eval
entry points compose the greedy rollout, ImageEvaluator L1/SSIM, the
test_variance probe (test_seq2seqL1.py:99-142), and the HTML gallery
with attention heatmaps — none of which a unit test exercises together.
"""

import pytest
import os

TINY = ["--cpu", "--synthetic", "--synthetic_n", "8",
        "--img_size", "16", "--hidden_size", "16", "--word_vec_dim", "8",
        "--operator_fc_dim", "16", "--n_layers", "1",
        "--decoder_max_len", "3", "--encoder_max_len", "6",
        "--resnet_widths", "8,8,16,16", "--vis_feat_dim", "16"]


def test_test_fivek_cli_synthetic(tmp_path, capsys):
    """Full eval CLI on synthetic data from a random init: metrics dict
    printed (in/out L1 + SSIM), variance probe runs, gallery written."""
    from t2onet_tpu.cli import test_fivek

    run = str(tmp_path / "run")
    test_fivek.main(TINY + ["--visualize", "1", "--run_dir", run])
    out = capsys.readouterr().out
    # random-init warning path (no checkpoint in a fresh run_dir)
    assert "no checkpoint found" in out
    # ImageEvaluator protocol lines + the final rounded dict
    assert "input L1 dist" in out and "input SSIM" in out
    assert "'out_L1'" in out and "'out_SSIM'" in out
    # the 10-canonical-request variance probe (reference test_variance)
    assert "avg var:" in out and "'variance'" in out
    # HTML gallery with at least one sample row
    index = os.path.join(run, "test", "web", "index.html")
    assert os.path.exists(index)
    html = open(index).read()
    assert "input" in html and "img" in html


@pytest.mark.slow
def test_test_fivek_cli_restores_trained_checkpoint(tmp_path, capsys):
    """train -> eval round trip through the CLIs: the eval CLI must load
    the checkpoint the trainer wrote (not evaluate a random init)."""
    from t2onet_tpu.cli import test_fivek, train_fivek

    run = str(tmp_path / "run")
    train_fivek.main(TINY + [
        "--batch_size", "4", "--num_iters", "2", "--checkpoint_every", "2",
        "--print_every", "2", "--val_batches", "1", "--fs_only",
        "--data_parallel", "0", "--run_dir", run])
    capsys.readouterr()
    test_fivek.main(TINY + ["--skip_variance", "--run_dir", run])
    out = capsys.readouterr().out
    assert "loaded checkpoint" in out
    assert "'out_L1'" in out
