"""Full-episode parity vs the actual PyTorch reference (SURVEY.md §4c).

Imports the reference Actor from /root/reference (torch + cv2 are real;
kornia and the unvendored edgeconnect submodule are shimmed — see
scripts/parity_harness.py), runs its episode_forward and our
Actor.episode on identical (image, request) batches built from the
reference's REAL vocab / GloVe / annotation files, and asserts identical
op sequences + per-step image L1 <= 1e-3.

This is the oracle test the whole fidelity claim rests on (reference
models/actor.py:184-284); component-level parity (encoder/decoder/heads
at 2e-5) lives in tests/test_torch_parity.py.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

sys.path.insert(0, os.path.join(REPO))

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference checkout not available")


def test_episode_parity_vs_reference():
    from scripts.parity_harness import run_parity

    metrics = run_parity(ref_dir=REF, batch=4, img_size=32, tol=1e-3,
                         verbose=False, platform=None)  # conftest pins cpu
    assert metrics["ops_match"]
    assert metrics["img_l1_max"] <= 1e-3


def test_supervised_loss_and_grad_parity_vs_reference():
    """The reference trainer's supervised iteration whole-vs-whole: same
    converted weights, same batch, train-mode BN — op NLL and param
    MSE/nnz must match to 1e-4 and the full gradient trees must align
    (reference experiments/t2onet/train_seq2seqL1.py:51-61)."""
    from scripts.parity_harness import run_supervised_parity

    m = run_supervised_parity(ref_dir=REF, batch=4, img_size=32,
                              tol=1e-4, grad_cos_min=0.999,
                              verbose=False, platform=None)
    assert m["op_loss_delta"] <= 1e-4
    assert m["param_loss_delta"] <= 1e-4
    assert m["grad_cos_min"] >= 0.999


def test_planner_head_to_head_vs_nelder_mead():
    """Our on-device multi-start-Adam planner must match the reference's
    scipy Nelder-Mead beam search in solution quality on identical pairs
    (reference utils/beam_search.py:65-91, 196-264) — the SURVEY §7
    'hard part'. Tiny images + few pairs keep the reference side fast;
    the full 32-pair/64px run is scripts/planner_headtohead.py
    (measured numbers in docs/PARITY.md)."""
    from scripts.planner_headtohead import run_headtohead

    m = run_headtohead(ref_dir=REF, pairs=3, img_size=32, n_iters=80,
                       tol=5e-3, platform=None, verbose=False)
    assert m["our_dist_mean"] <= m["ref_dist_mean"] + 1e-3
