"""CheckpointManager: save / restore / best-tracking / resume-latest."""

import numpy as np
import jax
import jax.numpy as jnp

from t2onet_tpu.config import ModelConfig, OperatorConfig
from t2onet_tpu.models.actor import Actor
from t2onet_tpu.train.checkpoint import CheckpointManager
from t2onet_tpu.train.loop import create_train_state


def _tiny_state():
    from tests.conftest import tiny_model_config

    # tiny widths matter here: orbax round-trips the whole pytree to disk
    # several times, and a full-width ResNet state is ~45 MB per save
    cfg = tiny_model_config(encoder_max_len=6, decoder_max_len=3)
    actor = Actor(cfg=cfg, opcfg=OperatorConfig(), vocab_size=12)
    x = jnp.ones((1, 6), jnp.int32)
    img = jnp.zeros((1, 3, 32, 32))
    return create_train_state(actor, jax.random.PRNGKey(0), x, img)


def test_save_restore_best_and_latest(tmp_path):
    state = _tiny_state()
    cm = CheckpointManager(str(tmp_path / "ckpt"))

    assert cm.save(state, 10, val_dist=0.5) is True          # first is best
    bumped = state.replace(
        step=jnp.asarray(20),
        params=jax.tree_util.tree_map(lambda x: x + 1.0, state.params))
    assert cm.save(bumped, 20, val_dist=0.9) is False        # worse val

    best = cm.restore(state, "best")
    latest = cm.restore(state, "latest")
    assert int(best.step) == 0 and int(latest.step) == 20
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(best.params)[0]),
        np.asarray(leaf))
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(latest.params)[0]),
        np.asarray(leaf) + 1.0)
    assert cm.stats["best_iter"] == 10
    assert cm.stats["best_val_dist"] == 0.5

    # a fresh manager on the same dir reloads stats (resume path)
    cm2 = CheckpointManager(str(tmp_path / "ckpt"))
    assert cm2.stats["best_iter"] == 10


def test_max_to_keep_prunes_old_checkpoints(tmp_path):
    import os

    import jax
    import jax.numpy as jnp

    from t2onet_tpu.train.checkpoint import PytreeCheckpointer

    ck = PytreeCheckpointer(str(tmp_path / "ck"), max_to_keep=2)
    tree = {"w": jnp.ones((2,))}
    for itr in [1, 2, 3, 4]:
        ck.save(tree, itr, best=(itr == 2))
    kept = sorted(d for d in os.listdir(tmp_path / "ck")
                  if d.startswith("checkpoint_iter"))
    assert kept == ["checkpoint_iter00000003", "checkpoint_iter00000004"]
    # best copy survives pruning
    assert (tmp_path / "ck" / "checkpoint_best").exists()
    restored = ck.restore({"w": jnp.zeros((2,))}, which="latest")
    assert jax.numpy.allclose(restored["w"], 1.0)


def test_latest_skips_orbax_tmp_dirs(tmp_path):
    """A crash mid-save leaves 'checkpoint_iterN.orbax-checkpoint-tmp-<ts>'
    dirs; resume must never target them and pruning must clear them."""
    import os

    import jax.numpy as jnp

    from t2onet_tpu.train.checkpoint import (PytreeCheckpointer,
                                             _resolve_ckpt_path)

    ck = PytreeCheckpointer(str(tmp_path / "ck"), max_to_keep=2)
    tree = {"w": jnp.ones((2,))}
    ck.save(tree, 1)
    ck.save({"w": jnp.full((2,), 2.0)}, 2)
    # simulate a partial save from a crashed process — sorts above both
    stale = tmp_path / "ck" / "checkpoint_iter00000003.orbax-checkpoint-tmp-99"
    stale.mkdir()
    assert _resolve_ckpt_path(str(tmp_path / "ck"), "latest").endswith(
        "checkpoint_iter00000002")
    restored = ck.restore({"w": jnp.zeros((2,))}, which="latest")
    assert float(restored["w"][0]) == 2.0
    # the next save's prune clears the stale tmp dir and keeps both
    # finalized checkpoints (tmp garbage must not occupy keep slots)
    ck.save({"w": jnp.full((2,), 3.0)}, 3)
    names = sorted(os.listdir(tmp_path / "ck"))
    assert not any(".orbax-checkpoint-tmp" in d for d in names)
    assert [d for d in names if d.startswith("checkpoint_iter")] == [
        "checkpoint_iter00000002", "checkpoint_iter00000003"]


def test_corrupt_stats_json_does_not_brick_run_dir(tmp_path):
    """stats.json truncated by a crash mid-write must not make the
    constructor raise (it would turn every supervisor relaunch into an
    instant failure)."""
    d = tmp_path / "ckpt"
    d.mkdir()
    (d / "stats.json").write_text('{"val_dist": [0.5], "tr')   # truncated
    cm = CheckpointManager(str(d))
    assert cm.stats["best_val_dist"] == float("inf")
    # and the (atomic) save path rewrites a valid file
    cm._save_stats()
    cm2 = CheckpointManager(str(d))
    assert cm2.stats["best_val_dist"] == float("inf")
