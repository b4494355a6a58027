"""Jittable operator executor ("the bank").

The reference's Executor dispatches by regrouping the batch per op id
(reference: models/actor.py:100-114, 157-172; executors/executor.py:33-55).
That is host-driven and shape-dynamic. Here the dispatch is a fixed-shape
*compute-all-then-blend*: every op's pixel math runs on the whole batch and
a one-hot weight picks each sample's result. Gradients flow only through
the selected op (the one-hot is constant), matching the reference's
semantics, and the whole step compiles to one fused XLA region — ideal for
the VPU and for pjit batch sharding.

Op indexing: *executor index* 0..7 (order in OP_NAMES); the decoder's op
vocab id maps via ``vocab_id - 3`` with ids < 3 (<NONE>/<START>/<END>)
executing as identity (reference: executor.py:44-46, actor.py:165).

Parameter heads: each op owns fc1 (512 -> operator_fc_dim) -> LeakyReLU ->
fc2 (-> num_op_param) over the decoder context (reference: operators.py:
43-55, 73-88). Here all 8 heads are stacked into two batched matmuls.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from t2onet_tpu.ops import operators as O
from t2onet_tpu.ops.color import tanh_range

N_OPS = 8
MAX_PARAM = 24
N_VOCAB_OPS = 11        # <NONE> <START> <END> + 8 ops
VOCAB_OFFSET = 3        # vocab id - 3 = executor index


class HeadParams(NamedTuple):
    """Stacked per-op parameter-head weights.

    w1: (N_OPS, ctx_dim, fc_dim);  b1: (N_OPS, fc_dim)
    w2: (N_OPS, fc_dim, MAX_PARAM); b2: (N_OPS, MAX_PARAM)
    fc2 outputs are padded to MAX_PARAM; op-specific squashing reads the
    slice it needs and the rest is zeroed.
    """

    w1: jax.Array
    b1: jax.Array
    w2: jax.Array
    b2: jax.Array


def head_init_specs(ctx_dim: int = 512, fc_dim: int = 512):
    """name -> (shape, uniform limit) for the four head tensors — the ONE
    place defining the torch nn.Linear kaiming-uniform init contract
    (shared by init_head_params and models.actor.ParamHeads)."""
    lim1 = 1.0 / float(ctx_dim) ** 0.5
    lim2 = 1.0 / float(fc_dim) ** 0.5
    return {
        "w1": ((N_OPS, ctx_dim, fc_dim), lim1),
        "b1": ((N_OPS, fc_dim), lim1),
        "w2": ((N_OPS, fc_dim, MAX_PARAM), lim2),
        "b2": ((N_OPS, MAX_PARAM), lim2),
    }


def init_head_params(key, ctx_dim: int = 512, fc_dim: int = 512) -> HeadParams:
    """Kaiming-uniform init matching torch nn.Linear defaults."""
    specs = head_init_specs(ctx_dim, fc_dim)
    keys = jax.random.split(key, 4)
    draws = {name: jax.random.uniform(k, shape, minval=-lim, maxval=lim)
             for k, (name, (shape, lim)) in zip(keys, specs.items())}
    return HeadParams(**draws)


def raw_head_features(heads: HeadParams, context: jax.Array) -> jax.Array:
    """All-op parameter head forward: context (B, ctx) -> raw (B, N_OPS, 24).

    Two batched matmuls (MXU) instead of 8 small per-group ones.
    """
    h = jnp.einsum("bc,ocf->obf", context, heads.w1) + heads.b1[:, None]
    h = jax.nn.leaky_relu(h, negative_slope=0.01)   # torch LeakyReLU default
    out = jnp.einsum("obf,ofp->obp", h, heads.w2) + heads.b2[:, None]
    return jnp.transpose(out, (1, 0, 2))            # (B, N_OPS, 24)


def squash_params(raw: jax.Array, cfg) -> jax.Array:
    """Apply each op's output squashing to its slice of the raw features.

    raw: (B, N_OPS, 24) -> squashed (B, N_OPS, 24), entries beyond each
    op's param count zeroed (matching the reference's padding to 24,
    actor.py:166). cfg: OperatorConfig.

    Per-op squashers (reference: models/operators.py op_param_regressor):
      brightness  tanh_range(±brightness_range)        (operators.py:266-269)
      contrast    tanh                                  (operators.py:231-232)
      saturation  tanh(relu(x))*hi + tanh(relu(-x))*lo  (operators.py:461-465)
      color       raw (24)                              (operators.py:602-605)
      inpaint     zeros (pseudo)                        (operators.py:651-657)
      tone        raw (8)                               (operators.py:566-569)
      sharpness   sigmoid * sharpness_range             (operators.py:340-343)
      white       sigmoid                               (operators.py:501-502)
    """
    b = raw.shape[0]
    x0 = raw[:, :, 0]                                # (B, N_OPS) first feature
    cols = []
    br = tanh_range(-cfg.brightness_range, cfg.brightness_range, initial=0.0)
    sat_lo, sat_hi = cfg.saturation_range

    def col(i, vec):                                 # scalar param in col 0
        z = jnp.zeros((b, MAX_PARAM), raw.dtype)
        return z.at[:, 0].set(vec)

    cols.append(col(0, br(x0[:, 0])))                                    # brightness
    cols.append(col(1, jnp.tanh(x0[:, 1])))                              # contrast
    sat = (jnp.tanh(jax.nn.relu(x0[:, 2])) * sat_hi
           + jnp.tanh(jax.nn.relu(-x0[:, 2])) * sat_lo)
    cols.append(col(2, sat))                                             # saturation
    cols.append(raw[:, 3, :])                                            # color: raw 24
    cols.append(jnp.zeros((b, MAX_PARAM), raw.dtype))                    # inpaint: zeros
    tone = jnp.zeros((b, MAX_PARAM), raw.dtype).at[:, :8].set(raw[:, 5, :8])
    cols.append(tone)                                                    # tone: raw 8
    cols.append(col(6, jax.nn.sigmoid(x0[:, 6]) * cfg.sharpness_range))  # sharpness
    cols.append(col(7, jax.nn.sigmoid(x0[:, 7])))                        # white
    return jnp.stack(cols, axis=1)                   # (B, N_OPS, 24)


def predict_params(heads: HeadParams, context: jax.Array, cfg) -> jax.Array:
    """context (B, ctx) -> squashed per-op params (B, N_OPS, 24)."""
    return squash_params(raw_head_features(heads, context), cfg)


def param_ranges(cfg):
    """Per-op (ub, lb, initial) scalars in executor order (reference
    get_param_range: brightness operators.py:288-291, contrast 250-253,
    saturation 484-487, color 618-621, inpaint 674-677, tone 587-590,
    sharpness 363-366, white 517-520)."""
    import numpy as np

    ub = np.asarray([cfg.brightness_range, 1.0, cfg.saturation_range[1],
                     cfg.color_curve_range[1], 0.0, cfg.tone_curve_range[1],
                     cfg.sharpness_range, 1.0], np.float32)
    lb = np.asarray([-cfg.brightness_range, -1.0, cfg.saturation_range[0],
                     cfg.color_curve_range[0], 0.0, cfg.tone_curve_range[0],
                     0.0, 0.0], np.float32)
    initial = np.asarray([0.0, 0.0, 0.0,
                          (cfg.color_curve_range[0] + cfg.color_curve_range[1]) / 2,
                          0.0,
                          (cfg.tone_curve_range[0] + cfg.tone_curve_range[1]) / 2,
                          cfg.sharpness_range / 2, 0.5], np.float32)
    return ub, lb, initial


def _param_valid_mask():
    """(N_OPS, MAX_PARAM) — 1 where column j is a real parameter of op i."""
    import numpy as np

    m = np.zeros((N_OPS, MAX_PARAM), np.float32)
    for i, k in enumerate(O.PARAM_COUNTS):
        m[i, :k] = 1.0
    return m


def add_param_noise(params: jax.Array, rng, cfg,
                    factor: float = 0.6) -> jax.Array:
    """Exploration noise on predicted parameters (the reference's
    `has_noise` path, operators.py:57-60, 113-121): standard-normal noise
    scaled asymmetrically so +3 sigma spans `factor` of (initial..ub) and
    -3 sigma spans `factor` of (lb..initial), then clamped to [lb, ub].
    Padding columns stay zero.

    Sign fix vs the reference: operators.py:59 ADDS both relu terms, so
    its noise is non-negative for every draw — exploration could only ever
    push parameters up. Both terms' magnitudes and the /3*factor scaling
    are kept; the negative branch gets the sign its own docstring ("3 tau
    spans factor of value range", fiveK_train_options.py:56) implies.

    :param params: (B, N_OPS, 24) squashed per-op params.
    :param factor: reference param_noise_factor default 0.6
        (fiveK_train_options.py:56).
    """
    ub, lb, initial = param_ranges(cfg)
    ub = jnp.asarray(ub)[None, :, None]
    lb = jnp.asarray(lb)[None, :, None]
    init = jnp.asarray(initial)[None, :, None]
    n = jax.random.normal(rng, params.shape, params.dtype)
    scaled = (jax.nn.relu(n) * (ub - init)
              - jax.nn.relu(-n) * (init - lb)) / 3.0 * factor
    noised = jnp.clip(params + scaled, lb, ub)
    valid = jnp.asarray(_param_valid_mask())[None]
    return jnp.where(valid > 0, noised, params)


def discrete_param_grid(cfg, num: int = 10):
    """Candidate parameter values per op for the discrete (classification)
    mode (reference Operator.discretize, operators.py:146-161: range
    starting at 0 -> linspace drop 0; symmetric range -> linspace drop the
    middle 0). Returns (grid (N_OPS, num) f32, supported (N_OPS,) bool).

    Ops whose range fits neither rule (saturation's asymmetric
    [-0.2, 0.8]) or that have no classifier in the reference (the curve
    ops — op_param_classifier is simply absent on Tone/Color, and the
    base setup notes 'only support 1 operator parameter',
    operators.py:53-54) are unsupported: callers keep the regression
    output for them (the reference would raise).
    """
    import numpy as np

    ub, lb, _ = param_ranges(cfg)
    grid = np.zeros((N_OPS, num), np.float32)
    supported = np.zeros((N_OPS,), bool)
    for i in range(N_OPS):
        if O.PARAM_COUNTS[i] != 1 or (ub[i] == 0 and lb[i] == 0):
            continue
        if lb[i] == 0:
            grid[i] = np.delete(np.linspace(0, ub[i], num + 1), 0)
        elif lb[i] == -ub[i]:
            grid[i] = np.delete(np.linspace(lb[i], ub[i], num + 1), num // 2)
        else:
            continue
        supported[i] = True
    return grid, supported


def gt_param_bins(gt_scalar: jax.Array, op_exec_idx: jax.Array, cfg,
                  num: int = 10):
    """Nearest discretization bin of each gt scalar parameter under its
    op's grid — the classification target for training the discrete
    parameter mode. Returns (bins (...,), supported (...,) bool); entries
    whose op is special (< 0) or not discrete-capable are unsupported.
    """
    grid, supported = discrete_param_grid(cfg, num)
    idx = jnp.clip(op_exec_idx, 0, N_OPS - 1)
    d = jnp.abs(jnp.asarray(grid)[idx] - gt_scalar[..., None])
    bins = jnp.argmin(d, axis=-1)
    sup = jnp.asarray(supported)[idx] & (op_exec_idx >= 0)
    return bins, sup


def select_discrete_params(raw: jax.Array, cont_params: jax.Array, rng,
                           sample: bool, explore_prob: float, cfg,
                           num: int = 10):
    """Discrete parameter selection (reference discrete_param=1 mode:
    op_param_classifier + select_param_ind, operators.py:164-175, 198-205).

    The first `num` columns of each op's raw head output are bin logits;
    the value is the chosen bin's grid entry. Sampling smooths the softmax
    with explore_prob epsilon-greedy mass exactly as the reference;
    sample=False takes the argmax.

    :param raw: (B, N_OPS, 24) pre-squash head features.
    :param cont_params: (B, N_OPS, 24) regression params — kept for ops
        the discrete mode does not support (see discrete_param_grid).
    :return: (params (B, N_OPS, 24), bin log-probs (B, N_OPS, num)).
    """
    grid, supported = discrete_param_grid(cfg, num)
    logits = raw[:, :, :num]
    logp = jax.nn.log_softmax(logits, axis=-1)
    if sample:
        probs = jnp.exp(logp) * (1.0 - explore_prob) + explore_prob / num
        probs = probs / (probs.sum(axis=-1, keepdims=True) + 1e-30)
        ind = jax.random.categorical(rng, jnp.log(probs + 1e-30), axis=-1)
    else:
        ind = jnp.argmax(logp, axis=-1)
    vals = jnp.take_along_axis(jnp.asarray(grid)[None], ind[..., None],
                               axis=-1)[..., 0]          # (B, N_OPS)
    disc = jnp.zeros_like(cont_params).at[:, :, 0].set(vals)
    sup = jnp.asarray(supported)[None, :, None]
    return jnp.where(sup, disc, cont_params), logp


def execute_onehot(img, onehot, params, mask=None, inpaint_fn=None):
    """Execute a (possibly different) op per sample, fixed shapes.

    :param img: (B, 3, H, W)
    :param onehot: (B, N_OPS + 1) — slot 0 = identity (special tokens),
        slots 1..8 = executor ops 0..7.
    :param params: (B, N_OPS, 24) per-op parameters (from predict_params)
        OR (B, 24) one shared parameter row used for every op.
    :param mask: (B, 1|3, H, W) or None.
    :return: (B, 3, H, W) edited images.
    """
    per_op = params.ndim == 3

    def p(i):
        return params[:, i] if per_op else params

    # The reference blends the RAW op output into the mask and clamps to
    # [0,1] only after (operators.py:129-130) — with a fractional mask,
    # pre-clipping an overshooting op (sharpness, contrast) would change
    # the result. A wide finite guard (invisible inside [0,1] and to any
    # realistic overshoot) keeps inf from an unselected branch (e.g. a
    # near-zero curve_sum in color/tone) from poisoning the one-hot blend
    # with NaN.
    def g(x):
        return jnp.clip(x, -1e4, 1e4)

    outs = [img]                                      # identity slot
    outs.append(g(O.brightness(img, p(0))))
    outs.append(g(O.contrast(img, p(1))))
    outs.append(g(O.saturation(img, p(2))))
    outs.append(g(O.color_curve(img, p(3))))
    outs.append(g(O.inpaint(img, p(4), inpaint_fn)))
    outs.append(g(O.tone_curve(img, p(5)[:, :8])))
    outs.append(g(O.sharpness(img, p(6))))
    outs.append(O.white(img, p(7)))
    stacked = jnp.stack(outs, axis=1)                 # (B, 9, 3, H, W)
    blended = jnp.einsum("bk,bkchw->bchw", onehot, stacked)
    out = O.mask_blend(blended, img, mask)            # blend, THEN clamp
    # identity must stay exactly the input (reference returns img untouched
    # for op_ind < 0, executor.py:44-46) — skip the clamp for that slot.
    return jnp.where(onehot[:, 0:1, None, None] > 0.5, img, out)


def vocab_onehot(op_vocab_ids: jax.Array) -> jax.Array:
    """Decoder op-vocab ids (B,) -> execute_onehot weights (B, N_OPS+1).

    ids < 3 (NONE/START/END) select the identity slot.
    """
    exec_idx = op_vocab_ids - VOCAB_OFFSET
    slot = jnp.where(exec_idx < 0, 0, exec_idx + 1)
    return jax.nn.one_hot(slot, N_OPS + 1, dtype=jnp.float32)


def select_params(op_vocab_ids: jax.Array, params: jax.Array) -> jax.Array:
    """Chosen (padded) parameter row per sample without executing images.

    op_vocab_ids (B,), params (B, N_OPS, 24) -> (B, 24); zeros for special
    tokens (matching the reference's zero params for op_ind < 0,
    executor.py:44-46).
    """
    onehot = vocab_onehot(op_vocab_ids)
    return jnp.einsum("bk,bkp->bp", onehot[:, 1:], params)


def execute_bank(img, op_vocab_ids, params, mask=None, inpaint_fn=None):
    """The Executor.execute equivalent for a whole batch of mixed ops.

    :param op_vocab_ids: (B,) decoder vocab ids (0..10).
    :param params: (B, N_OPS, 24) or (B, 24) — see execute_onehot.
    Returns (out_imgs (B,3,H,W), chosen_params (B, 24)).
    """
    onehot = vocab_onehot(op_vocab_ids)
    out = execute_onehot(img, onehot, params, mask, inpaint_fn)
    if params.ndim == 3:
        chosen = jnp.einsum("bk,bkp->bp", onehot[:, 1:], params)
    else:
        chosen = params * (1.0 - onehot[:, 0:1])
    return out, chosen
