"""Operation planning: pseudo-ground-truth action-sequence generation.

The reference runs scipy Nelder-Mead per (pair, beam, op) on the host with
hundreds of full-image executor calls per fit (reference:
utils/beam_search.py:65-91, SURVEY.md §3.3). Here every (beam x op x
restart) parameter fit is a single batched on-device Adam optimization
through the differentiable operators — the "north star" kernel of
BASELINE.json.
"""

from t2onet_tpu.planner.fit import fit_op_params, init_candidates  # noqa: F401
from t2onet_tpu.planner.beam import beam_search  # noqa: F401
