"""Differentiable image operator library (the reference's L0 layer).

Pure functions over NCHW float32 RGB images in [0, 1]. Spec:
reference models/operators.py (formulas cited per-op in operators.py here).
"""

from t2onet_tpu.ops.color import (  # noqa: F401
    hsv_to_rgb,
    lerp,
    rgb_to_hsv,
    rgb2lum,
    tanh01,
    tanh_range,
)
from t2onet_tpu.ops.operators import (  # noqa: F401
    OP_NAMES,
    PARAM_COUNTS,
    apply_op_by_index,
    brightness,
    color_curve,
    contrast,
    exposure,
    bnw,
    blur,
    hue,
    white_balance,
    inpaint,
    mask_blend,
    saturation,
    sharpness,
    tone_curve,
    white,
)
from t2onet_tpu.ops.bank import (  # noqa: F401
    N_OPS,
    execute_bank,
    execute_onehot,
    squash_params,
)
