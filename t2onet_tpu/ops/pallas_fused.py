"""Fused operator-chain Pallas kernel.

The perf-critical inference/planner path: apply a K-step sequence of
editing operators to each image with the image tile resident in VMEM for
the WHOLE chain — one HBM read + one HBM write per image total, and only
the *selected* op branch computed per step (`lax.switch` on a
scalar-prefetched op id), unlike the differentiable jnp bank which blends
all 8 branches.

Layout: images are NCHW with W as the lane dimension (512 = 4x128 lanes);
per-channel (H, W) planes map directly onto the VPU's (8, 128) tiles.

Grid: one program per image; the Pallas pipeline overlaps the next image's
HBM->VMEM DMA with the current image's compute.

Perf regime (round-5 probes, scripts/kernel_probe{5..10} on the real
v5e): the kernel is VPU-issue-bound, NOT bandwidth-bound — a tone chain
with constant-block index maps (no HBM traffic) runs in the same time as
the real chain, so the DMA is fully hidden behind compute. At b128/512px
a full-tile vector op costs ~0.086 ms; the min-form curve's 2 ops/knot
is the op-count minimum. Measured no-gain-or-worse and rejected:
multi-image blocks (G=2/4: 7.2 ms vs 5.0), dimension_semantics
"parallel", plain GridSpec vs scalar prefetch, uint8 wire (no direct
u8<->f32 Mosaic cast; the i32 hops cost ~1 ms, eating the DMA saving),
4-way accumulator splits (8.1 vs 7.3 all-tone), segment/select-tree
curve forms (23.7 ms). The mixed-workload headline ~142k ops/s is the
speed of light for this op mix in f32 on this chip.

Op slot ids (same as ops.bank): 0 identity, 1..8 = executor ops
brightness, contrast, saturation, color, inpaint(identity), tone,
sharpness, white.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_SLOTS = 9
MAX_PARAM = 24
CURVE_STEPS = 8


# ---------------------------------------------------------------------------
# per-branch pixel math on a (3, H, W) VMEM-resident tile
# fp32; scalars come in as a (24,) f32 read from SMEM
# ---------------------------------------------------------------------------

def _brightness(img, p):
    # RGB-domain exact form of the HSV value scale (see ops/operators.py)
    v = jnp.maximum(jnp.maximum(img[0], img[1]), img[2])
    k = jnp.clip(v * (1.0 + p[0]), 0.0, 1.0) / (v + 1e-12)
    return img * k[None]


def _saturation(img, p):
    """RGB-domain exact form of the HSV saturation scale, SINGLE
    division: with s = d/(v+e1), d = v-min, the bank's
    clip(s(1+p),0,1)/(s+e2) equals clip(d(1+p),0,v+e1)/(d + e2(v+e1))
    exactly in real arithmetic. The naive single-div VJP squares the
    denominator — at black pixels (v = d = 0) that square is (1e-20)^2,
    below the f32 normal range, and the quotient rule evaluates
    0/0 = nan (caught on real FiveK images, round 4). Fix: scale num
    AND den by 2^20 — an EXACT fp scaling (exponent shift; the quotient
    is bit-identical) that lifts den^2 to ~1e-28, safely normal."""
    S = 1048576.0                                  # 2^20
    v = jnp.maximum(jnp.maximum(img[0], img[1]), img[2])
    mn = jnp.minimum(jnp.minimum(img[0], img[1]), img[2])
    d = v - mn
    ve = v + 1e-8
    num = jnp.clip(d * (1.0 + p[0]), 0.0, ve) * S
    ratio = num / (d * S + (1e-12 * S) * ve)
    return v[None] - ratio[None] * (v[None] - img)


# sin(pi*u)/u as an even polynomial in u^2, least-squares fit on [0, 0.5]:
# max abs error of the reconstructed sin is 8e-11 (2e-7 in f32 — below
# f32 rounding of the builtin). Mosaic lowers jnp.cos through a slow
# multi-pass transcendental; 6 FMAs are ~10x cheaper on the VPU.
_SINPI_C = (3.1415926536, -5.1677127683, 2.5501634534,
            -5.9925387121e-1, 8.2058791186e-2, -7.0429524662e-3)


def _cospi01(x):
    """cos(pi*x) for x in [0, 1] via cos(pi x) = -sin(pi(x - 1/2))."""
    u = x - 0.5
    v = u * u
    acc = jnp.full_like(x, _SINPI_C[-1])
    for c in reversed(_SINPI_C[:-1]):
        acc = acc * v + c
    return -(acc * u)


def _contrast(img, p):
    """Cosine-lum contrast. The polynomial runs in Estrin form (same
    coefficients, regrouped: halved dependency depth) and the lerp is
    folded to one per-pixel scale img*((1-p) + p*ratio) — measured
    4.66 vs 5.03 ms on the all-contrast 5-step chain (probe 7), exact
    to fp regrouping (1e-6 vs the Horner/lerp form)."""
    lum = jnp.clip(0.27 * img[0] + 0.67 * img[1] + 0.06 * img[2], 0.0, 1.0)
    u = lum - 0.5
    v = u * u
    w = v * v
    C = _SINPI_C
    acc = (C[0] + C[1] * v) + w * ((C[2] + C[3] * v) + w * (C[4] + C[5] * v))
    clum = (acc * u) * 0.5 + 0.5        # = -cos(pi*lum)/2 + 1/2
    ratio = clum / (lum + 1e-6)
    k = (1.0 - p[0]) + p[0] * ratio
    return img * k[None]


def _curve_1ch(x, p, off=0):
    """S-step monotone curve in min-form: with t = S*x and x in [0, 1],

        sum_i p_i * clip(x - i/S, 0, 1/S) * S/csum
          == a*x - sum_{j=1..S-1} b_j * min(x, j/S)

    where a = S*p_{S-1}/csum, b_j = S*(p_j - p_{j-1})/csum — EXACT in real
    arithmetic (clip(t-i,0,1) telescopes into relu(t-j) differences and
    relu(t-j) = t - min(t,j)). 2 VPU passes per knot instead of the
    segment form's 4-5 (sub+clamp+clamp+fma); the a/b_j reductions are
    scalar (SMEM) math, off the vector unit entirely."""
    S = CURVE_STEPS
    csum = 1e-10
    for i in range(S):
        csum = csum + p[off + i]
    s = S / csum
    # single accumulator chain: a 2-chain ILP split was measured SLOWER
    # (138.7k vs 142.0k ops/s mixed) — Mosaic already pipelines across
    # the (8,128) tile chunks, and the extra init+final-add costs more
    out = (s * p[off + S - 1]) * x
    for j in range(1, S):
        out = out - (s * (p[off + j] - p[off + j - 1])) * jnp.minimum(
            x, j / S)
    return out


def _tone(img, p):
    return _curve_1ch(img, p)


def _color(img, p):
    return jnp.stack([_curve_1ch(img[c], p, off=c * CURVE_STEPS)
                      for c in range(3)])


def _shift_zero(x, dy, dx):
    """out[y, x] = img[y-dy, x-dx], zero-filled — via concat (Mosaic has no
    scatter; concatenation of static slices lowers cleanly)."""
    if dy == 1:
        x = jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
    elif dy == -1:
        x = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
    if dx == 1:
        x = jnp.concatenate([jnp.zeros_like(x[:, :, :1]), x[:, :, :-1]], axis=2)
    elif dx == -1:
        x = jnp.concatenate([x[:, :, 1:], jnp.zeros_like(x[:, :, :1])], axis=2)
    return x


def _sharpness(img, p):
    delta = 4.0 * img
    delta = delta - _shift_zero(img, 1, 0) - _shift_zero(img, -1, 0)
    delta = delta - _shift_zero(img, 0, 1) - _shift_zero(img, 0, -1)
    return img + p[0] * delta


def _sharpness_roll(img, p):
    """Laplacian sharpen via pltpu.roll (sublane/lane rotate, ~1 VPU pass)
    + edge masks, instead of `_shift_zero`'s concat-of-slices (a full tile
    copy per shift in Mosaic). TPU-only (roll has no interpret lowering)."""
    h, w = img.shape[1], img.shape[2]
    yi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    zero = jnp.zeros((), img.dtype)
    # roll requires shift >= 0: shift by size-1 == shift by -1
    dn = jnp.where(yi >= 1, pltpu.roll(img, 1, 1), zero)
    up = jnp.where(yi < h - 1, pltpu.roll(img, h - 1, 1), zero)
    rt = jnp.where(xi >= 1, pltpu.roll(img, 1, 2), zero)
    lt = jnp.where(xi < w - 1, pltpu.roll(img, w - 1, 2), zero)
    delta = 4.0 * img - dn - up - rt - lt
    return img + p[0] * delta


def _white(img, p):
    return jnp.ones_like(img)


def _identity(img, p):
    return img


_BRANCHES = [
    _identity,     # 0 special tokens
    _brightness,   # 1
    _contrast,     # 2
    _saturation,   # 3
    _color,        # 4
    _identity,     # 5 inpaint slot (pluggable backend runs outside)
    _tone,         # 6
    _sharpness,    # 7
    _white,        # 8
]


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _apply_step(op, img, plist, m):
    """One chain step on a VMEM-resident (3, H, W) tile: selected-branch
    switch -> optional mask blend -> clamp, with the identity slot
    returning the input untouched (matches bank.execute_onehot
    blend-THEN-clamp + identity-skip semantics exactly, so gradients of
    this step equal the differentiable bank's)."""

    def apply(branch):
        return lambda operand: branch(operand[0], operand[1])

    out = jax.lax.switch(op, [apply(f) for f in _BRANCHES], (img, plist))
    if m is not None:
        out = out * m[None] + img * (1.0 - m[None])
    out = jnp.clip(out, 0.0, 1.0)
    return jnp.where(op == 0, img, out)


def _run_step(op, out_ref, params_fn, m, use_roll):
    """One chain step, in place on the VMEM-resident out_ref tile.

    ONE `lax.switch` over unit-returning branches that read the tile,
    apply their op + optional mask blend + clamp, and store back — so a
    step costs the taken branch plus one scalar dispatch. Two designs
    measured and rejected on-chip (b128 512px, scripts/kernel_probe*.py):
    a VALUE-carrying `lax.switch` (Mosaic copies the (3,H,W) tile per
    nested-if level: param-free `white` at slot 8 cost as much as the
    full tone curve), and a chain of 7 `pl.when` regions each
    read-modify-writing the tile (a flat ~18 ms/call floor even with no
    branch taken; untaken store-only regions measure free, so it is the
    guarded RMW chain that kills the pipeline). The identity slots write
    nothing — exactly the reference's special-token semantics (no mask
    blend, no clamp).
    """
    sharp = _sharpness_roll if use_roll else _sharpness

    def finish(out, img):
        if m is not None:
            out = out * m[None] + img * (1.0 - m[None])
        return jnp.clip(out, 0.0, 1.0)

    def mk(branch):
        def go():
            img = out_ref[0]
            out_ref[0] = finish(branch(img, params_fn()), img)
        return go

    def noop():
        pass

    # slots 0 (special tokens) and 5 (inpaint: pluggable backend runs
    # outside the kernel) are identity: no write.
    jax.lax.switch(op, [noop, mk(_brightness), mk(_contrast),
                        mk(_saturation), mk(_color), noop, mk(_tone),
                        mk(sharp), mk(_white)])


def _chain_kernel(ops_ref, params_ref, img_ref, out_ref, *, n_steps,
                  use_roll):
    b = pl.program_id(0)
    out_ref[0] = img_ref[0]

    def step(k, carry):
        # dynamic-k SMEM scalar reads; branch bodies are emitted ONCE
        # (a fori_loop over steps keeps Mosaic compile time flat in K)
        _run_step(ops_ref[b, k], out_ref,
                  lambda: [params_ref[b, k, j]
                           for j in range(MAX_PARAM)], None, use_roll)
        return carry

    jax.lax.fori_loop(0, n_steps, step, 0)


def _masked_chain_kernel(ops_ref, params_ref, img_ref, mask_ref, out_ref, *,
                         n_steps, use_roll):
    """Chain with per-step mask blending (reference operators.py:129-130:
    out = clip(op(img)*mask + img*(1-mask))) — the GIER local-edit path,
    mask resident in VMEM alongside the image for the whole chain."""
    b = pl.program_id(0)
    m = mask_ref[0, 0]                                # (H, W)
    out_ref[0] = img_ref[0]

    def step(k, carry):
        _run_step(ops_ref[b, k], out_ref,
                  lambda: [params_ref[b, k, j]
                           for j in range(MAX_PARAM)], m, use_roll)
        return carry

    jax.lax.fori_loop(0, n_steps, step, 0)


def fused_chain(imgs: jax.Array, op_slots: jax.Array, params: jax.Array,
                mask: jax.Array | None = None,
                interpret: bool | None = None) -> jax.Array:
    """Apply per-image op chains.

    :param imgs: (B, 3, H, W) f32 in [0, 1].
    :param op_slots: (B, K) int32 slot ids (0 identity, 1..8 executor+1).
    :param params: (B, K, 24) f32.
    :param mask: optional (B, 1, H, W) f32 in [0, 1] — each step's output is
        blended into the unedited region (reference operators.py:129-130).
    :return: (B, 3, H, W) f32.
    """
    b, _, h, w = imgs.shape
    k = op_slots.shape[1]
    if interpret is None:
        # Mosaic only compiles for TPU; interpret everywhere else
        interpret = jax.default_backend() != "tpu"

    img_spec = pl.BlockSpec((1, 3, h, w), lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [img_spec]
    operands = [imgs]
    if mask is None:
        kernel = functools.partial(_chain_kernel, n_steps=k,
                                   use_roll=not interpret)
    else:
        kernel = functools.partial(_masked_chain_kernel, n_steps=k,
                                   use_roll=not interpret)
        in_specs.append(pl.BlockSpec((1, 1, h, w), lambda i, *_: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(mask.astype(imgs.dtype))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,            # op_slots + params in SMEM
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 3, h, w), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(imgs.shape, imgs.dtype),
        compiler_params=pltpu.CompilerParams(
            # whole-image blocks: double-buffered in+out (4 x 3HW f32)
            # + switch-branch temporaries; v5e has 128M VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(op_slots.astype(jnp.int32), params.astype(jnp.float32), *operands)


# ---------------------------------------------------------------------------
# differentiable single-step kernel (episode-phase training)
# ---------------------------------------------------------------------------

def _bwd_branches(op, p, m, img_ref, g_ref, dimg_ref, dp_ref):
    """Switch-dispatched VJP: only the SELECTED branch's backward runs.

    jax.vjp is applied *inside* each unit-returning switch branch to that
    branch's step math (branch -> mask blend -> clamp) — linearization
    happens at trace time, so each branch lowers to ordinary elementwise
    math + full-plane reductions (one scalar per parameter), with the
    tile resident in VMEM, and the switch carries NO value (a
    value-carrying switch makes Mosaic copy the tile per nested-if
    level; see `_run_step`).
    """
    def mk(branch):
        def go():
            def f(im, ps):
                out = branch(im, ps)
                if m is not None:
                    out = out * m[None] + im * (1.0 - m[None])
                return jnp.clip(out, 0.0, 1.0)

            out, vjp = jax.vjp(f, img_ref[0], p)
            del out
            d_img, d_p = vjp(g_ref[0])
            dimg_ref[0] = d_img
            # ONE vector store: dp_ref is a VMEM (1,1,24) block — scalar
            # stores inside a switch branch (the old SMEM design) lower
            # to garbage on TPU (nan grads; caught by the real-data
            # training run, reproduced at 64px — Mosaic only supports
            # whole-vector stores under branch control flow)
            dp_ref[0, 0] = jnp.stack(d_p)
        return go

    def ident():
        # slots 0/5: step is a gradient-transparent pass-through (img is
        # already in [0,1] so the clamp passes the cotangent unchanged)
        dimg_ref[0] = g_ref[0]
        dp_ref[0, 0] = jnp.zeros((MAX_PARAM,), jnp.float32)

    jax.lax.switch(op, [ident, mk(_brightness), mk(_contrast),
                        mk(_saturation), mk(_color), ident, mk(_tone),
                        mk(_sharpness), mk(_white)])


def _step_bwd_kernel(ops_ref, params_ref, img_ref, g_ref, dimg_ref, dp_ref):
    b = pl.program_id(0)
    op = ops_ref[b, 0]
    p = [params_ref[b, 0, j] for j in range(MAX_PARAM)]
    _bwd_branches(op, p, None, img_ref, g_ref, dimg_ref, dp_ref)


def _masked_step_bwd_kernel(ops_ref, params_ref, img_ref, mask_ref, g_ref,
                            dimg_ref, dp_ref):
    b = pl.program_id(0)
    op = ops_ref[b, 0]
    p = [params_ref[b, 0, j] for j in range(MAX_PARAM)]
    _bwd_branches(op, p, mask_ref[0, 0], img_ref, g_ref, dimg_ref, dp_ref)


def _step_bwd(imgs, op_slots, params, g, mask, interpret):
    b, _, h, w = imgs.shape
    img_spec = pl.BlockSpec((1, 3, h, w), lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [img_spec]
    operands = [imgs]
    if mask is None:
        kernel = _step_bwd_kernel
    else:
        kernel = _masked_step_bwd_kernel
        in_specs.append(pl.BlockSpec((1, 1, h, w), lambda i, *_: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(mask.astype(imgs.dtype))
    in_specs.append(img_spec)                          # cotangent
    operands.append(g)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 3, h, w), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # 24 param-grads per image: VMEM, written as ONE (24,)
            # vector inside the selected switch branch (SMEM scalar
            # stores under branch control flow lower to garbage on TPU)
            pl.BlockSpec((1, 1, MAX_PARAM), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    d_img, d_params = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(imgs.shape, imgs.dtype),
            jax.ShapeDtypeStruct((b, 1, MAX_PARAM), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(op_slots[:, None].astype(jnp.int32),
      params[:, None].astype(jnp.float32), *operands)
    return d_img, d_params[:, 0]


def _make_fused_step(with_mask: bool):
    @jax.custom_vjp
    def step(imgs, op_slots, params, *rest):
        mask = rest[0] if with_mask else None
        return fused_chain(imgs, op_slots[:, None], params[:, None],
                           mask=mask)

    def fwd(imgs, op_slots, params, *rest):
        return step(imgs, op_slots, params, *rest), (imgs, op_slots, params,
                                                     *rest)

    def bwd(res, g):
        imgs, op_slots, params = res[:3]
        mask = res[3] if with_mask else None
        d_img, d_params = _step_bwd(imgs, op_slots, params, g, mask,
                                    interpret=jax.default_backend() != "tpu")
        if with_mask:
            return d_img, None, d_params, None
        return d_img, None, d_params

    step.defvjp(fwd, bwd)
    return step


_FUSED_STEP = _make_fused_step(False)
_FUSED_STEP_MASKED = _make_fused_step(True)


def fused_step(imgs: jax.Array, op_slots: jax.Array, params: jax.Array,
               mask: jax.Array | None = None) -> jax.Array:
    """Differentiable single chain step (the episode-rollout inner op).

    Same math as `fused_chain` with K=1, but with a custom VJP whose
    backward is itself a Pallas kernel (`_step_bwd_kernel`): both passes
    compute only the per-image SELECTED branch, unlike the jnp bank
    (`ops.bank.execute_bank`) which materializes all 8 op outputs and
    blends by one-hot. Gradients match the bank's (same blend-then-clamp
    + identity-skip semantics; pinned in tests/test_pallas_fused.py) up
    to one harmless subgradient choice: at exactly-black pixels (x == 0)
    the min-form curve's d/dx is S*p0/csum where the bank's clip-segment
    form tie-splits to half that; interior knots x = j/S agree. No inpaint_fn support (slot 5 is
    identity), mask receives no gradient (it is ground-truth data).

    :param imgs: (B, 3, H, W) f32 in [0, 1].
    :param op_slots: (B,) int32 slot ids (0 identity, 1..8 executor+1).
    :param params: (B, 24) f32 chosen parameter rows.
    :param mask: optional (B, 1, H, W) f32.
    """
    if mask is None:
        return _FUSED_STEP(imgs, op_slots, params)
    return _FUSED_STEP_MASKED(imgs, op_slots, params, mask)


def vocab_ops_to_slots(op_vocab_ids: jax.Array) -> jax.Array:
    """Decoder vocab ids (B, K) -> kernel slot ids (identity for ids < 3)."""
    exec_idx = op_vocab_ids - 3
    return jnp.where(exec_idx < 0, 0, exec_idx + 1).astype(jnp.int32)


def fused_chain_sharded(imgs: jax.Array, op_slots: jax.Array,
                        params: jax.Array, mesh,
                        mask: jax.Array | None = None,
                        interpret: bool | None = None) -> jax.Array:
    """Multi-chip fused_chain: batch sharded over the mesh's first axis,
    one independent Pallas kernel per chip, no collectives (op chains are
    per-image). Throughput scales linearly in chips; the first mesh axis's
    size must divide B (other axes replicate).
    """
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    if imgs.shape[0] % n:
        raise ValueError(f"batch {imgs.shape[0]} not divisible by the "
                         f"{axis!r} mesh axis size {n}")

    if mask is None:
        def local(i, s, p):
            return fused_chain(i, s, p, interpret=interpret)

        in_specs = (P(axis), P(axis), P(axis))
        args = (imgs, op_slots, params)
    else:
        def local(i, s, p, m):
            return fused_chain(i, s, p, mask=m, interpret=interpret)

        in_specs = (P(axis), P(axis), P(axis), P(axis))
        args = (imgs, op_slots, params, mask)

    # check_vma=False: pallas_call's out ShapeDtypeStruct carries no
    # varying-mesh-axis annotation; the kernel is trivially per-shard
    f = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                      out_specs=P(axis), check_vma=False)
    return f(*args)
