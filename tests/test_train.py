"""End-to-end training smoke tests on synthetic data + a sharded-step test
over the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2onet_tpu.config import ModelConfig, OperatorConfig
from t2onet_tpu.data.synthetic import SyntheticFiveK, synthetic_vocab
from t2onet_tpu.models.actor import Actor
from t2onet_tpu.parallel.mesh import make_mesh, shard_batch
from t2onet_tpu.train.loop import (
    create_train_state,
    make_episode_step,
    make_supervised_step,
    supervised_losses,
)

IMG = 32


@pytest.fixture(scope="module")
def setup():
    from tests.conftest import tiny_model_config

    vocab = synthetic_vocab()
    ds = SyntheticFiveK(n=32, img_size=IMG, seed=0, req_max_len=12)
    cfg = tiny_model_config(encoder_max_len=12, decoder_max_len=5)
    actor = Actor(cfg=cfg, opcfg=OperatorConfig(), vocab_size=len(vocab))
    batch = next(ds.batches(batch_size=8, steps=1))
    state = create_train_state(
        actor, jax.random.PRNGKey(0),
        jnp.asarray(batch["x"]), jnp.asarray(batch["img_x"]))
    return actor, state, ds


@pytest.fixture(scope="module")
def sup_step(setup):
    """ONE traced supervised step shared by every test in this module
    (each make_supervised_step call would retrace the whole train step)."""
    actor, _, _ = setup
    return make_supervised_step(actor, donate=False)


def _to_jnp(batch):
    return {k: jnp.asarray(v) for k, v in batch.items() if k != "req"}


def test_supervised_step_decreases_loss(setup, sup_step):
    actor, state, ds = setup
    step = sup_step
    # one FIXED batch, stepped repeatedly: comparing losses measured on
    # different shuffled batches is apples-to-oranges and flaky
    batch = _to_jnp(next(ds.batches(batch_size=8, steps=1, shuffle=False)))
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_episode_step_runs(setup):
    actor, state, ds = setup
    step = make_episode_step(actor, sample=True, donate=False)
    batch = next(ds.batches(batch_size=8, steps=1))
    b = _to_jnp(batch)
    b = {"x": b["x"], "img_x": b["img_x"], "gt_img": b["img_y"][:, -1]}
    state2, m = step(state, b, jax.random.PRNGKey(7))
    assert np.isfinite(float(m["L1_loss"]))
    # params actually changed
    diff = jax.tree_util.tree_map(
        lambda a, b_: float(jnp.abs(a - b_).sum()), state.params, state2.params)
    assert sum(jax.tree_util.tree_leaves(diff)) > 0


def test_supervised_step_sharded_over_mesh(setup, sup_step):
    """Data-parallel supervised step over the 8-device CPU mesh."""
    actor, state, ds = setup
    mesh = make_mesh()
    assert len(mesh.devices.ravel()) == 8
    step = make_supervised_step(actor, mesh=mesh, donate=False)
    batch = next(ds.batches(batch_size=8, steps=1))
    sharded = shard_batch(_to_jnp(batch), mesh)
    state2, m = step(state, sharded)
    assert np.isfinite(float(m["loss"]))
    # compare against unsharded step: same loss
    _, m_local = sup_step(state, _to_jnp(batch))
    np.testing.assert_allclose(float(m["loss"]), float(m_local["loss"]),
                               rtol=2e-4)


def test_supervised_losses_masking():
    """Positions past the batch-max step must not contribute to op loss."""
    b, t, ncls = 2, 7, 11
    logprobs = jnp.log(jnp.full((b, t - 1, ncls), 1.0 / ncls))
    y = jnp.array([[1, 3, 2, 0, 0, 0, 0],
                   [1, 4, 5, 2, 0, 0, 0]], jnp.int32)
    gt = jnp.zeros((b, t - 2, 24))
    op_loss, param_loss = supervised_losses(logprobs, jnp.zeros((b, t - 2, 24)), y, gt)
    # uniform logprobs: nll = log(11) averaged over included positions
    np.testing.assert_allclose(float(op_loss), np.log(ncls), rtol=1e-6)
    assert float(param_loss) == 0.0


def test_supervised_step_deterministic(setup, sup_step):
    """Same seed + data -> bitwise-identical losses (the reference's only
    determinism control is cudnn flags, fiveK_base_options.py:78-84; here
    XLA gives it for free — pinned by this test)."""
    actor, state, ds = setup
    step = sup_step
    batch = _to_jnp(next(ds.batches(batch_size=8, steps=1, shuffle=False)))
    _, m1 = step(state, batch)
    _, m2 = step(state, batch)
    assert float(m1["loss"]) == float(m2["loss"])


def test_train_supervisor_restarts(tmp_path):
    import subprocess, sys, textwrap

    marker = tmp_path / "count"
    script = tmp_path / "flaky.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys
        p = {str(marker)!r}
        n = int(open(p).read()) if os.path.exists(p) else 0
        open(p, 'w').write(str(n + 1))
        # crash twice, succeed third time; expect --resume on retries
        if n < 2:
            sys.exit(1)
        assert '--resume' in sys.argv
    """))
    r = subprocess.run(
        [sys.executable, "-m", "t2onet_tpu.cli.train_supervisor",
         "--backoff", "0.05", "--max_restarts", "3", "--",
         sys.executable, str(script)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stdout + r.stderr
    assert marker.read_text() == "3"


@pytest.mark.slow
def test_train_fivek_resume_continues_numbering(tmp_path):
    """Crash-resume contract: after restore, iteration numbering (and so
    checkpoint names, phase parity, and pruning order) continues from the
    restored step instead of restarting at 1 — a restart-at-1 run would
    make the next 'latest' resume load stale pre-crash weights."""
    import os

    from t2onet_tpu.cli import train_fivek

    run = str(tmp_path / "run")
    base = ["--cpu", "--synthetic", "--synthetic_n", "16",
            "--img_size", "16", "--batch_size", "4",
            "--checkpoint_every", "2", "--print_every", "2",
            "--val_batches", "0", "--fs_only", "--hidden_size", "16",
            "--word_vec_dim", "8", "--operator_fc_dim", "16",
            "--n_layers", "1", "--decoder_max_len", "3",
            "--encoder_max_len", "6", "--resnet_widths", "8,8,16,16",
            "--vis_feat_dim", "16", "--data_parallel", "0",
            "--run_dir", run]
    train_fivek.main(base + ["--num_iters", "4"])
    ckdir = os.path.join(run, "seq2seqL1_model")
    first = sorted(d for d in os.listdir(ckdir)
                   if d.startswith("checkpoint_iter"))
    assert first == ["checkpoint_iter00000002", "checkpoint_iter00000004"]
    # widen the horizon and resume: new checkpoints continue 6, 8
    train_fivek.main(base + ["--num_iters", "8", "--resume"])
    second = sorted(d for d in os.listdir(ckdir)
                    if d.startswith("checkpoint_iter"))
    assert second == ["checkpoint_iter00000002", "checkpoint_iter00000004",
                      "checkpoint_iter00000006", "checkpoint_iter00000008"]
