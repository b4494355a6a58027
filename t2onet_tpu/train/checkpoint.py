"""Checkpoint / resume with best-model tracking.

The reference saves weights-only state_dicts every `checkpoint_every` iters
plus a tracked-best copy and a stats JSON (reference:
experiments/t2onet/train_seq2seqL1.py:103-131) — and loses optimizer state
on resume. Here full training state (params + batch_stats + opt state +
step) is checkpointed with orbax, so resume is exact.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

# finalized step checkpoints only — a crash mid-save leaves orbax tmp dirs
# ('checkpoint_iterNNNNNNNN.orbax-checkpoint-tmp-<ts>') that must never be
# resumed from or counted against max_to_keep
_FINAL_RE = re.compile(r"^checkpoint_iter\d+$")


def _final_ckpts(ckpt_dir: str):
    return sorted(d for d in os.listdir(ckpt_dir) if _FINAL_RE.match(d))


def _resolve_ckpt_path(ckpt_dir: str, which: str) -> str:
    """'best' / 'latest' / explicit path -> checkpoint directory."""
    if which == "best":
        return os.path.join(ckpt_dir, "checkpoint_best")
    if which == "latest":
        cands = _final_ckpts(ckpt_dir)
        if not cands:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
        return os.path.join(ckpt_dir, cands[-1])
    return which


def _prune_old(ckpt_dir: str, max_to_keep: Optional[int]):
    """Drop the oldest finalized checkpoint_iter* dirs beyond max_to_keep
    (checkpoint_best is never pruned), plus any stale orbax tmp dirs left
    behind by a crash mid-save (safe here: callers wait_until_finished()
    before pruning, so no save is in flight)."""
    import shutil

    for d in os.listdir(ckpt_dir):
        if d.startswith("checkpoint_") and ".orbax-checkpoint-tmp" in d:
            shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)
    if not max_to_keep:
        return
    for d in _final_ckpts(ckpt_dir)[:-max_to_keep]:
        shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)


class CheckpointManager:
    def __init__(self, ckpt_dir: str, max_to_keep: Optional[int] = None):
        """max_to_keep: prune all but the newest N step checkpoints
        (default None keeps everything — the reference's behavior)."""
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        self.max_to_keep = max_to_keep
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.stats: Dict[str, Any] = {
            "val_dist": [],
            "train_iter": [],
            "best_iter": 0,
            "best_val_dist": float("inf"),
        }
        self._load_stats()

    # -- stats ---------------------------------------------------------
    def _stats_path(self) -> str:
        return os.path.join(self.ckpt_dir, "stats.json")

    def _load_stats(self):
        if os.path.exists(self._stats_path()):
            try:
                with open(self._stats_path()) as f:
                    self.stats = json.load(f)
            except (json.JSONDecodeError, OSError) as e:
                # stats are advisory (best-model tracking); a truncated file
                # from a crash must not brick the run dir
                print(f"warning: corrupt {self._stats_path()} ({e}); "
                      "resetting best-model stats")

    def _save_stats(self):
        # temp-file + atomic rename: a crash mid-write can't truncate the
        # stats a future resume will read
        tmp = self._stats_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.stats, f)
        os.replace(tmp, self._stats_path())

    # -- save / restore --------------------------------------------------
    def _state_tree(self, state):
        return {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }

    def save(self, state, itr: int, val_dist: Optional[float] = None) -> bool:
        """Save a step checkpoint; track best by val L1. Returns is_best."""
        path = os.path.join(self.ckpt_dir, f"checkpoint_iter{itr:08d}")
        self._ckptr.save(path, self._state_tree(state), force=True)
        is_best = False
        if val_dist is not None:
            self.stats["val_dist"].append(float(val_dist))
            self.stats["train_iter"].append(int(itr))
            if val_dist < self.stats["best_val_dist"]:
                self.stats["best_val_dist"] = float(val_dist)
                self.stats["best_iter"] = int(itr)
                best = os.path.join(self.ckpt_dir, "checkpoint_best")
                self._ckptr.save(best, self._state_tree(state), force=True)
                is_best = True
        # StandardCheckpointer commits asynchronously; block so a process
        # exiting right after save can't truncate the checkpoint
        self._ckptr.wait_until_finished()
        _prune_old(self.ckpt_dir, self.max_to_keep)
        self._save_stats()
        return is_best

    def restore(self, state, which: str = "best"):
        """Restore into the structure of `state` (a TrainState template)."""
        path = _resolve_ckpt_path(self.ckpt_dir, which)
        template = jax.tree_util.tree_map(lambda x: x, self._state_tree(state))
        restored = self._ckptr.restore(path, template)
        return state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )


class PytreeCheckpointer:
    """Save/restore an arbitrary pytree with best tracking — used for state
    that rides alongside the actor's TrainState (e.g. the GAN
    discriminator bundle, which the reference also persists inside its
    model.pth: load_seq2seqgan_disc restores the whole Pix2PixHDModel,
    beam_search.py:52-63)."""

    def __init__(self, ckpt_dir: str, max_to_keep: Optional[int] = None):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        self.max_to_keep = max_to_keep
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, tree, itr: int, best: bool = False):
        path = os.path.join(self.ckpt_dir, f"checkpoint_iter{itr:08d}")
        self._ckptr.save(path, tree, force=True)
        if best:
            self._ckptr.save(os.path.join(self.ckpt_dir, "checkpoint_best"),
                             tree, force=True)
        self._ckptr.wait_until_finished()
        _prune_old(self.ckpt_dir, self.max_to_keep)

    def restore(self, template, which: str = "best"):
        return self._ckptr.restore(
            _resolve_ckpt_path(self.ckpt_dir, which),
            jax.tree_util.tree_map(lambda x: x, template))
