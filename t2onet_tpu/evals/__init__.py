"""Evaluation: L1 / SSIM / FID metric protocol, variance probe, galleries."""

from t2onet_tpu.evals.metrics import (  # noqa: F401
    ImageEvaluator,
    TEST_TXTS,
    calculate_frechet_distance,
    l1_distance,
    ssim,
)
