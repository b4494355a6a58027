"""Unified CLI dispatcher (`python -m t2onet_tpu`) and the checkpoint
conversion CLI (cli/convert.py): reference model.pth -> run directory."""

import os

import numpy as np
import pytest


def test_dispatcher_help(capsys):
    from t2onet_tpu.__main__ import COMMANDS, main

    assert main([]) == 0
    out = capsys.readouterr().out
    for cmd in COMMANDS:
        assert cmd in out


def test_dispatcher_unknown(capsys):
    from t2onet_tpu.__main__ import main

    assert main(["frobnicate"]) == 2
    assert "unknown command" in capsys.readouterr().err


def test_dispatcher_commands_resolve():
    """Every registered command names an importable module with main()."""
    import importlib

    from t2onet_tpu.__main__ import COMMANDS

    for mod_path, _desc in COMMANDS.values():
        mod = importlib.import_module(f"t2onet_tpu.{mod_path}")
        assert callable(mod.main)


@pytest.mark.slow
def test_convert_cli_roundtrip(tmp_path):
    """model.pth -> cli.convert -> run dir restorable by CheckpointManager,
    with the exact params convert_state_dict produces."""
    torch = pytest.importorskip("torch")

    import jax
    import jax.numpy as jnp

    from t2onet_tpu.cli import convert as convert_cli
    from t2onet_tpu.cli import common
    from t2onet_tpu.convert.torch_checkpoint import convert_state_dict
    from t2onet_tpu.train.checkpoint import CheckpointManager
    from t2onet_tpu.train.loop import create_train_state
    from tests.test_torch_parity import build_reference_state_dict

    vocab = 23
    # narrow language dims (the ResNet side stays the reference's fixed
    # 64..512): full-width conversion numerics are already pinned by
    # test_torch_parity; this test checks the CLI plumbing + run layout
    sd = build_reference_state_dict(vocab, wv=32, hid=32)
    pth = str(tmp_path / "model.pth")
    torch.save({k: v.detach().clone() for k, v in sd.items()}, pth)

    run_dir = str(tmp_path / "run")
    dims = ["--hidden_size", "32", "--word_vec_dim", "32"]
    convert_cli.main(["--torch_ckpt", pth, "--vocab_size", str(vocab),
                      "--run_dir", run_dir, "--img_size", "32"] + dims)

    # restore through the exact path test_fivek/demo use
    class _A:
        pass

    p = __import__("argparse").ArgumentParser()
    common.add_base_args(p)
    a = p.parse_args(["--run_dir", run_dir, "--img_size", "32"] + dims)
    actor, _cfg = common.build_actor(a, vocab)
    state = create_train_state(
        actor, jax.random.PRNGKey(0),
        jnp.zeros((1, a.encoder_max_len), jnp.int32),
        jnp.zeros((1, 3, 32, 32)))
    ckpt_dir = os.path.join(run_dir, "seq2seqL1_model")
    assert os.path.isdir(os.path.join(ckpt_dir, "checkpoint_best"))
    restored = CheckpointManager(ckpt_dir).restore(state, "best")

    want, _stats = convert_state_dict(sd)
    got_leaf = np.asarray(
        restored.params["lang_encoder"]["embedding"])
    np.testing.assert_allclose(got_leaf,
                               np.asarray(want["lang_encoder"]["embedding"]),
                               atol=1e-7)
    head = np.asarray(jax.tree_util.tree_leaves(
        restored.params["op_heads"] if "op_heads" in restored.params
        else restored.params)[0])
    assert np.isfinite(head).all()
