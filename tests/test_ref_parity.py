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
