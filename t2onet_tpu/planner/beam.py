"""Beam-search operation planning (plain / eps-greedy / fixed-order).

Control flow matches the reference planner (reference: utils/beam_search.py
:196-264; eps-greedy variant beam_search_eps_greedy.py:283-302; fixed-order
variant beam_search_fixed_order.py:250) — but all the compute (parameter
fitting + operator execution + distances for every beam x op x restart)
happens in ONE jitted device call per step via planner.fit. The host only
does tiny list bookkeeping over <= beam_size sequences.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from t2onet_tpu.ops import bank
from t2onet_tpu.ops import operators as O
from t2onet_tpu.planner import fit as F

OP_NAMES = list(O.OP_NAMES)


def _fit_step(I_buff: np.ndarray, target, op_slots, n_starts, n_iters, lr,
              init_key, op_masks=None, dist_type="l1", score_fn=None,
              score_aux=None, mesh=None):
    """One device call: fit all (beam, op, start) candidates.

    With `mesh`, the (pair x beam) leading axis is sharded over the mesh's
    first axis: the already-jitted fit follows the input sharding
    (computation-follows-data GSPMD), so lockstep planning scales over ICI
    with no separate SPMD code path. Candidates are independent, so the
    only collective is the loss-sum psum XLA inserts for the shared Adam
    scalar reduction.

    Returns (params (N,C,24), dists (N,C), outs (N,C,3,H,W)) as numpy,
    plus the candidate op index per column.
    """
    op_slots = tuple(int(op) for op in op_slots)
    cand_ops = F.candidate_op_slots(op_slots, n_starts)
    init = jnp.asarray(F.init_candidates(op_slots, n_starts, key=init_key))
    imgs = jnp.asarray(I_buff)
    n_real = imgs.shape[0]
    masks = _op_mask_rows(op_masks, op_slots, I_buff.shape[-2:])
    if mesh is not None and score_fn is not None:
        # the mesh path pads/shards imgs but score_aux would stay unpadded
        # and unsharded — fail clearly instead of deep inside jit
        raise ValueError(
            "mesh and score_fn cannot be combined: learned-distance "
            "scoring (seq2seqGAN-disc) runs single-device; drop mesh= or "
            "use dist_type l1/l2 for sharded planning")
    if mesh is not None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        pad = (-n_real) % n_dev          # device_put shards need divisibility
        tgt_b = jnp.broadcast_to(jnp.asarray(target), imgs.shape)
        if pad:
            imgs = jnp.concatenate([imgs, jnp.repeat(imgs[-1:], pad, 0)])
            tgt_b = jnp.concatenate([tgt_b, jnp.repeat(tgt_b[-1:], pad, 0)])
            if masks is not None and masks.ndim == 5:
                masks = jnp.concatenate(
                    [masks, jnp.repeat(masks[-1:], pad, 0)])
        bsh = NamedSharding(mesh, P(mesh.axis_names[0]))
        rep = NamedSharding(mesh, P())
        imgs = jax.device_put(imgs, bsh)
        target = jax.device_put(tgt_b, bsh)
        init = jax.device_put(init, rep)
        if masks is not None:
            masks = jax.device_put(masks,
                                   bsh if masks.ndim == 5 else rep)
    if score_fn is not None:
        params, dists = F.fit_op_params_scored_sel(
            imgs, init, op_slots, n_starts, score_fn, score_aux,
            n_iters=n_iters, lr=lr, masks=masks)
    else:
        params, dists = F.fit_op_params_sel(
            imgs, jnp.asarray(target), init, op_slots, n_starts,
            n_iters=n_iters, lr=lr, masks=masks, dist=dist_type)
    outs = F.execute_candidates_sel(imgs, params, op_slots, n_starts, masks)
    return (np.asarray(params)[:n_real], np.asarray(dists)[:n_real],
            np.asarray(outs)[:n_real], cand_ops)


def _op_mask_rows(op_masks, op_slots, hw):
    """op_masks ({op: (1,H,W)} dict or per-row list of dicts) -> per-OP
    mask tensor in the selected-fit layout: (n_ops, 1, H, W) shared or
    (N, n_ops, 1, H, W) per row; None when no row has any local op.
    (len(), not truthiness: op index 0 is a valid dict key.)"""
    has_masks = (len(op_masks) > 0 if isinstance(op_masks, dict)
                 else any(len(d) > 0 for d in op_masks)) \
        if op_masks is not None else False
    if not has_masks:
        return None
    h, w = hw

    def rows(d):
        return np.stack([d.get(int(op), np.ones((1, h, w), np.float32))
                         for op in op_slots])

    if isinstance(op_masks, dict):              # shared across rows
        return jnp.asarray(rows(op_masks))
    return jnp.asarray(np.stack([rows(d) for d in op_masks]))


def normalize_dist_type(dist_type: str) -> str:
    """Reference spellings ('L1'/'L2', beam_search.py:207) -> ours."""
    d = dist_type.lower()
    if d not in ("l1", "l2"):
        raise ValueError(
            f"dist_type {dist_type!r} invalid — 'l1'/'l2' here; learned "
            "distances ('seq2seqGAN-disc') go through score_fn (the "
            "reference's 'perceptual' is an unimplemented stub and "
            "'self-disc' references an undefined class, "
            "beam_search.py:41,176-177)")
    return d


def beam_search(
    I_0: np.ndarray,
    I_gt: np.ndarray,
    beam_size: int = 3,
    operations: Sequence[int] = F.DEFAULT_PLAN_OPS,
    max_step: int = 6,
    err: float = 1e-2,
    mode: str = "plain",
    eps: float = 0.05,
    n_starts: int = 2,
    n_iters: int = 100,
    lr: float = 0.05,
    replace: bool = False,
    seed: int = 0,
    op_masks=None,
    dist_type: str = "l1",
    score_fn=None,
    score_aux=None,
    inpaint_fn=None,
) -> Tuple[List[List[Tuple[str, list, float]]], List[List[np.ndarray]]]:
    """Plan an operation sequence for one (input, target) pair.

    :param I_0, I_gt: (1, 3, H, W) float32 in [0,1].
    :param mode: 'plain' (reference beam_search.py), 'eps' (eps-greedy
        variant), 'fixed' (fixed-order variant: operations[i] at step i,
        beam 1).
    :param op_masks: optional {executor_op_idx: (1, H, W) float mask} for
        local (masked) ops — the GIER planner's mask conditioning (the
        reference's gen_greedy_seqs_GIER intent; its own call is broken,
        gen_greedy_seqs_GIER.py:71, README.md:78).
    :param dist_type: 'l1' or 'l2' pixel distance (reference
        beam_search.py:170-180; accepts the reference's 'L1'/'L2').
    :param score_fn, score_aux: learned candidate distance instead of
        pixel distance — the 'seq2seqGAN-disc' planner mode (reference
        beam_search.py:226-236). Build with gan.make_disc_planner_score;
        aux carries (I_0, cond). I_gt is ignored when set.
    :param inpaint_fn: trained filler for the inpaint op: (B, 3, H, W) ->
        (B, 3, H, W), hole-mask semantics captured by the closure (build
        with models.inpaint.make_inpaint_fn). The inpaint candidate has
        no continuous parameters, so it is evaluated directly instead of
        fitted; without it, inpaint executes as identity and plain-mode
        beam search never selects it (an identity step cannot improve
        the distance). Reference: an external EdgeConnect checkpoint,
        models/operators.py:625-682.
    :return: (actions, images) — actions[b] = [(op_name, params, dist), ...]
        per beam; images[b] = per-step edited images (1,3,H,W). Same
        contract as the reference (beam_search.py:262-264).
    """
    if mode not in ("plain", "eps", "fixed"):
        raise ValueError(f"unknown beam-search mode {mode!r} "
                         "(want plain | eps | fixed)")
    rng = np.random.default_rng(seed)
    dist_type = normalize_dist_type(dist_type) if score_fn is None else "l1"
    if mode == "fixed":
        beam_size = 1
    # device-side top-k selection needs a pixel distance (the scored
    # mode's learned distance stays on the all-candidates path) and no
    # eps randomization (which permutes over ALL candidates)
    fused = mode in ("plain", "fixed") and score_fn is None

    min_dist = float("inf")
    sequences: List[Tuple[list, float]] = [([], float("inf"))]
    I_buff = I_0.copy()                           # (n_beam, 3, H, W)
    INPAINT = OP_NAMES.index("inpaint")

    for step in range(max_step):
        if mode == "fixed":
            step_ops = [operations[step]] if step < len(operations) else []
        else:
            step_ops = list(operations)
        if not step_ops:
            break
        # the inpaint candidate is parameterless: evaluate it directly
        # with the trained filler rather than through the Adam fit
        inp_outs = inp_dists = None
        if inpaint_fn is not None and INPAINT in step_ops:
            filled = np.asarray(inpaint_fn(jnp.asarray(I_buff)))
            if score_fn is not None:
                inp_dists = np.asarray(
                    score_fn(jnp.asarray(filled)[:, None],
                             score_aux))[:, 0]
            elif dist_type == "l2":
                inp_dists = ((filled - I_gt) ** 2).mean(axis=(1, 2, 3))
            else:
                inp_dists = np.abs(filled - I_gt).mean(axis=(1, 2, 3))
            inp_outs = filled
        fit_ops = [op for op in step_ops
                   if not (op == INPAINT and inp_outs is not None)]

        n_beam = len(sequences)
        used_by_beam = [set() if replace else
                        {OP_NAMES.index(a[0]) for a in sequences[j][0]}
                        for j in range(n_beam)]

        all_candidates, I_tmp = [], []
        no_update, finish = True, False
        tmp_min = []

        def consider(j, op, dist, p_list, out_img):
            nonlocal no_update, finish
            accept = (dist < min_dist) if mode == "plain" else True
            if accept:
                tmp_min.append(dist)
                seq = sequences[j][0] + [(OP_NAMES[op], p_list, dist)]
                all_candidates.append((seq, dist))
                I_tmp.append(out_img)
                no_update = False
                if dist < err:
                    finish = True

        if fused and fit_ops:
            fos = tuple(int(op) for op in fit_ops)
            allow = np.zeros((1, n_beam, len(fos)), bool)
            for j in range(n_beam):
                for i, op in enumerate(fos):
                    allow[0, j, i] = op not in used_by_beam[j]
            masks = _op_mask_rows(op_masks, fos, I_buff.shape[-2:])
            thr = min_dist if mode == "plain" else float("inf")
            k = min(beam_size, n_beam * len(fos))
            sel_imgs, sel_d, sel_params, sel_beam, sel_pos = \
                F.fit_select_step(
                    jnp.asarray(I_buff)[None], jnp.asarray(I_gt),
                    jnp.asarray(F.init_candidates(fos, n_starts,
                                                  key=seed + step)),
                    jnp.asarray(allow), jnp.asarray([thr], np.float32),
                    fos, n_starts, k, n_iters=n_iters, lr=lr,
                    dist=dist_type,
                    masks=None if masks is None else masks[None])
            sel_imgs, sel_d = np.asarray(sel_imgs[0]), np.asarray(sel_d[0])
            sel_params, sel_beam = np.asarray(sel_params[0]), np.asarray(
                sel_beam[0])
            sel_pos = np.asarray(sel_pos[0])
            for r in range(k):
                if not np.isfinite(sel_d[r]):
                    break
                op = fos[int(sel_pos[r])]
                consider(int(sel_beam[r]), op, float(sel_d[r]),
                         sel_params[r, : O.PARAM_COUNTS[op]].tolist(),
                         sel_imgs[r])
            if inp_outs is not None:
                for j in range(n_beam):
                    if INPAINT not in used_by_beam[j]:
                        consider(j, INPAINT, float(inp_dists[j]),
                                 [0.0] * O.PARAM_COUNTS[INPAINT],
                                 inp_outs[j])
        else:
            if fit_ops:
                params, dists, outs, cand_ops = _fit_step(
                    I_buff, I_gt, fit_ops, n_starts, n_iters, lr,
                    init_key=seed + step, op_masks=op_masks,
                    dist_type=dist_type, score_fn=score_fn,
                    score_aux=score_aux)
            else:                                 # inpaint-only search
                cand_ops = np.empty(0, np.int64)
            for j in range(n_beam):
                for op in step_ops:
                    if op in used_by_beam[j]:
                        continue
                    if op == INPAINT and inp_outs is not None:
                        dist = float(inp_dists[j])
                        p_list = [0.0] * O.PARAM_COUNTS[op]
                        out_img = inp_outs[j]
                    else:
                        cols = np.where(cand_ops == op)[0]
                        best = cols[int(np.argmin(dists[j, cols]))]
                        dist = float(dists[j, best])
                        kk = O.PARAM_COUNTS[op]
                        p_list = params[j, best, :kk].tolist()
                        out_img = outs[j, best]
                    consider(j, op, dist, p_list, out_img)
        if tmp_min:
            min_dist = min(min_dist, min(tmp_min))

        if len(all_candidates) < beam_size:       # (beam_search.py:249-252)
            all_candidates += sequences
            I_tmp += list(I_buff)
        order = np.argsort([c[1] for c in all_candidates], kind="stable")
        if mode == "eps" and rng.random() < eps:
            order = rng.permutation(len(all_candidates))
        keep = order[:beam_size]
        sequences = [all_candidates[i] for i in keep]
        I_buff = np.stack([I_tmp[i] for i in keep])
        if no_update or finish:
            break

    actions = [list(seq) for seq, _ in sequences]
    images = _replay_images(I_0, actions, op_masks, inpaint_fn)
    return actions, images


def _replay_images(I_0, actions, op_masks=None, inpaint_fn=None):
    """Recompute per-step images for each surviving beam. The reference
    keeps them alongside candidates; recomputing the <= beam*step
    survivors costs less than hauling every candidate image.

    Without an inpaint_fn every beam replays in ONE jitted scan + ONE
    transfer (_replay_images_batch); the host-round-trip loop survives
    only for inpaint steps (the filler runs host-side canny)."""
    if inpaint_fn is None:
        return _replay_images_batch(
            np.asarray(I_0), [actions],
            None if op_masks is None else [op_masks])[0]
    images = []
    for seq in actions:
        imgs = []
        cur = jnp.asarray(I_0)
        for (name, p_list, _d) in seq:
            op = OP_NAMES.index(name)
            p = jnp.asarray(np.asarray(p_list, np.float32)[None])
            mask = None
            if op_masks and op in op_masks:
                mask = jnp.asarray(op_masks[op])[None]
            cur = O.apply_op_by_index(cur, op, p, mask=mask,
                                      inpaint_fn=inpaint_fn)
            imgs.append(np.asarray(cur))
        images.append(imgs)
    return images


@functools.partial(jax.jit, static_argnames=("uint8_wire",))
def _replay_scan(imgs0, slots, params, masks_all, uint8_wire=False):
    """Replay padded op sequences on a batch of rows in one fused scan.

    imgs0 (N, 3, H, W); slots (N, S) bank slot ids (0 = identity
    padding); params (N, S, 24); masks_all optional (N, N_OPS+1, 1, H, W)
    per-slot edit masks (slot 0 unused). Returns (S, N, 3, H, W).

    uint8_wire quantizes per-step OUTPUTS (not the carried state) with
    save_img's exact floor(clip*255) so JPEG bytes are unchanged while
    the device->host transfer shrinks 4x (the tunnel downloads at
    ~33 MB/s vs GB/s uploads)."""

    def body(img, xs):
        slot, prm = xs
        onehot = jax.nn.one_hot(slot, bank.N_OPS + 1, dtype=img.dtype)
        m = None
        if masks_all is not None:
            m = jnp.take_along_axis(
                masks_all, slot[:, None, None, None, None], axis=1)[:, 0]
        out = bank.execute_onehot(img, onehot, prm, mask=m)
        y = (jnp.clip(out, 0, 1) * 255).astype(jnp.uint8) \
            if uint8_wire else out
        return out, y

    _, ys = jax.lax.scan(body, imgs0,
                         (slots.T, jnp.transpose(params, (1, 0, 2))))
    return ys


def _replay_images_batch(I_0s, actions_list, op_masks=None,
                         max_beams=None, uint8_wire=False):
    """Replay EVERY pair's surviving beams in one jitted scan and one
    device->host transfer (the per-(pair, beam, step) eager-dispatch
    replay dominated lockstep planning wall-clock through the tunnel).

    :param I_0s: (P, 3, H, W).
    :param actions_list: per pair, a list of beam action sequences.
    :param op_masks: None | per-pair list of {executor_op: (1, H, W)}.
    :param max_beams: replay only the first `max_beams` beams per pair
        (dataset planning writes just the top beam's edit images);
        remaining beams get empty image lists.
    :param uint8_wire: quantize step images to uint8 on device (see
        _replay_scan) and return float arrays u/255 — JPEG-identical.
    :return: per pair: images[b] = [per-step (1, 3, H, W) numpy arrays].
    """
    rows = []                                 # (pair_idx, seq)
    for pi, beams in enumerate(actions_list):
        for seq in beams[:max_beams]:
            rows.append((pi, seq))
    s_max = max((len(seq) for _, seq in rows), default=0)
    if s_max == 0:
        return [[[] for _ in beams] for beams in actions_list]
    # bucket the padded shapes (steps to multiples of 6, rows to
    # multiples of 4) so varying beam counts / sequence lengths across
    # pairs don't each compile a fresh _replay_scan variant; identity
    # slots and repeated rows are exact no-ops
    s_pad = -(-s_max // 6) * 6
    n = len(rows)
    n_pad = -(-n // 4) * 4
    h, w = I_0s.shape[-2:]
    slots = np.zeros((n_pad, s_pad), np.int32)
    params = np.zeros((n_pad, s_pad, bank.MAX_PARAM), np.float32)
    imgs0 = np.zeros((n_pad, 3, h, w), np.float32)
    for i, (pi, seq) in enumerate(rows):
        imgs0[i] = I_0s[pi]
        for s, (name, p_list, _d) in enumerate(seq):
            slots[i, s] = OP_NAMES.index(name) + 1
            params[i, s, : len(p_list)] = p_list
    masks_all = None
    has_masks = op_masks is not None and any(len(d) > 0 for d in op_masks)
    if has_masks:
        masks_all = np.ones((n_pad, bank.N_OPS + 1, 1, h, w), np.float32)
        for i, (pi, _seq) in enumerate(rows):
            for op, m in op_masks[pi].items():
                masks_all[i, int(op) + 1] = m
        masks_all = jnp.asarray(masks_all)
    ys = np.asarray(_replay_scan(jnp.asarray(imgs0), jnp.asarray(slots),
                                 jnp.asarray(params), masks_all,
                                 uint8_wire=uint8_wire))
    if uint8_wire:
        ys = ys.astype(np.float32) / 255.0
    out = [[] for _ in actions_list]
    for i, (pi, seq) in enumerate(rows):
        out[pi].append([ys[s, i][None] for s in range(len(seq))])
    for pi, beams in enumerate(actions_list):     # beams beyond max_beams
        while len(out[pi]) < len(beams):
            out[pi].append([])
    return out


def init_distance(I_0, I_gt) -> float:
    """L1 'init distance' recorded in planner JSONs (beam_search.py:331)."""
    return float(np.abs(np.asarray(I_0) - np.asarray(I_gt)).mean())


def batch_beam_search(
    I_0s: np.ndarray,
    I_gts: np.ndarray,
    beam_size: int = 3,
    operations: Sequence[int] = F.DEFAULT_PLAN_OPS,
    max_step: int = 6,
    err: float = 1e-2,
    mode: str = "plain",
    eps: float = 0.05,
    n_starts: int = 2,
    n_iters: int = 100,
    lr: float = 0.05,
    replace: bool = False,
    seed: int = 0,
    dist_type: str = "l1",
    mesh=None,
    op_masks=None,
    replay_beams=None,
    replay_uint8: bool = False,
):
    """Plan MANY pairs in lockstep: one device fit per step covers every
    (pair x beam x op x restart) candidate simultaneously.

    The reference's planner is embarrassingly parallel over pairs but runs
    them one scipy fit at a time (SURVEY.md §3.3); here P pairs' fits fuse
    into the same batched Adam run, so planner throughput scales with P
    until the chip saturates.

    :param I_0s, I_gts: (P, 3, H, W).
    :param mesh: optional jax.sharding.Mesh — the (pair x beam) axis of
        every fit shards over its first axis, scaling lockstep planning
        across chips (multi-chip planning in ONE process; the fleet
        launcher cli/plan_fleet.py is the multi-host alternative).
    :param op_masks: optional per-pair mask conditioning — a list of P
        dicts {executor_op_idx: (1, H, W) float mask} (the GIER local-edit
        planner, batched; see beam_search's op_masks).
    :param replay_beams: replay step images for only the first N beams
        per pair (dataset planning needs just the top beam); the rest
        return empty image lists.
    :param replay_uint8: uint8 image wire for the replay download —
        JPEG-byte-identical, 4x fewer bytes through the tunnel.
    :return: list of per-pair (actions, images) like beam_search's.
    """
    if mode not in ("plain", "eps", "fixed"):
        raise ValueError(f"unknown beam-search mode {mode!r} "
                         "(want plain | eps | fixed)")
    dist_type = normalize_dist_type(dist_type)
    if mode == "fixed":
        beam_size = 1
    if mode in ("plain", "fixed"):
        return _batch_beam_search_fused(
            I_0s, I_gts, beam_size, operations, max_step, err, mode,
            n_starts, n_iters, lr, replace, seed, dist_type, mesh,
            op_masks, replay_beams, replay_uint8)
    rng = np.random.default_rng(seed)
    p = I_0s.shape[0]
    # per-pair host state
    states = [{
        "min_dist": float("inf"),
        "sequences": [([], float("inf"))],
        "done": False,
    } for _ in range(p)]
    I_buff = I_0s[:, None].copy()                 # (P, n_beam, 3, H, W)

    for step in range(max_step):
        step_ops = list(operations)
        if not step_ops or all(s["done"] for s in states):
            break
        n_beam = I_buff.shape[1]
        flat = I_buff.reshape(p * n_beam, *I_buff.shape[2:])
        tgt = np.repeat(I_gts, n_beam, axis=0)
        row_masks = None
        if op_masks is not None:
            row_masks = [op_masks[pi] for pi in range(p)
                         for _ in range(n_beam)]
        params, dists, outs, cand_ops = _fit_step(
            flat, tgt, step_ops, n_starts, n_iters, lr,
            init_key=seed + step,
            dist_type=dist_type, mesh=mesh, op_masks=row_masks)
        params = params.reshape(p, n_beam, *params.shape[1:])
        dists = dists.reshape(p, n_beam, -1)
        outs = outs.reshape(p, n_beam, *outs.shape[1:])

        next_buff = []
        for pi, st in enumerate(states):
            if st["done"]:
                next_buff.append(_pad_beams(I_buff[pi], beam_size))
                continue
            all_candidates, I_tmp = [], []
            no_update, finish = True, False
            tmp_min = []
            for j in range(len(st["sequences"])):
                used = ([] if replace else
                        [OP_NAMES.index(a[0])
                         for a in st["sequences"][j][0]])
                for op in step_ops:
                    if op in used:
                        continue
                    cols = np.where(cand_ops == op)[0]
                    best = cols[int(np.argmin(dists[pi, j, cols]))]
                    dist = float(dists[pi, j, best])
                    k = O.PARAM_COUNTS[op]
                    accept = ((dist < st["min_dist"])
                              if mode == "plain" else True)
                    if accept:
                        tmp_min.append(dist)
                        seq = st["sequences"][j][0] + [
                            (OP_NAMES[op],
                             params[pi, j, best, :k].tolist(), dist)]
                        all_candidates.append((seq, dist))
                        I_tmp.append(outs[pi, j, best])
                        no_update = False
                        if dist < err:
                            finish = True
            if tmp_min:
                st["min_dist"] = min(st["min_dist"], min(tmp_min))
            if len(all_candidates) < beam_size:
                all_candidates += st["sequences"]
                I_tmp += list(I_buff[pi, : len(st["sequences"])])
            order = np.argsort([c[1] for c in all_candidates], kind="stable")
            if rng.random() < eps:
                order = rng.permutation(len(all_candidates))
            keep = order[:beam_size]
            st["sequences"] = [all_candidates[i] for i in keep]
            buf = np.stack([I_tmp[i] for i in keep])
            next_buff.append(_pad_beams(buf, beam_size))
            if no_update or finish:
                st["done"] = True
        I_buff = np.stack(next_buff)

    actions_list = [[list(seq) for seq, _ in st["sequences"]]
                    for st in states]
    reps = _replay_images_batch(I_0s, actions_list, op_masks,
                                max_beams=replay_beams,
                                uint8_wire=replay_uint8)
    return list(zip(actions_list, reps))


def _batch_beam_search_fused(I_0s, I_gts, beam_size, operations, max_step,
                             err, mode, n_starts, n_iters, lr, replace,
                             seed, dist_type, mesh=None, op_masks=None,
                             replay_beams=None, replay_uint8=False):
    """Device-resident lockstep planning (plain / fixed modes).

    Each step is ONE jitted fit_select_update call: fit all (pair x beam
    x op x restart) candidates, top-k select per pair, and compose the
    next beam buffer — all on device. The beam images NEVER visit the
    host; per step only (dists, params, indices) — a few KB — cross the
    boundary, vs ~19 MB/step of candidate images on the old path (the
    dominant cost through a tunnel-attached chip). Host bookkeeping
    mirrors the device composition rule exactly (see fit_select_update).
    """
    import jax

    p_real = I_0s.shape[0]
    bsh = rep = None
    pad = 0
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as PS

        bsh = NamedSharding(mesh, PS(mesh.axis_names[0]))
        rep = NamedSharding(mesh, PS())
        pad = (-p_real) % mesh.devices.size
    if pad:
        I_0s_d = np.concatenate([I_0s, np.repeat(I_0s[-1:], pad, 0)])
        I_gts_d = np.concatenate([I_gts, np.repeat(I_gts[-1:], pad, 0)])
    else:
        I_0s_d, I_gts_d = I_0s, I_gts
    p = I_0s_d.shape[0]

    states = [{
        "min_dist": float("inf"),
        "sequences": [([], float("inf"))],
        "done": pi >= p_real,            # padding pairs never search
    } for pi in range(p)]

    imgs = jnp.asarray(I_0s_d)[:, None]              # (P, 1, 3, H, W)
    tgts = jnp.asarray(I_gts_d)
    if mesh is not None:
        imgs = jax.device_put(imgs, bsh)
        tgts = jax.device_put(tgts, bsh)
    mask_cache = {}

    def masks_for(fos):
        if op_masks is None:
            return None
        if fos not in mask_cache:
            m = _op_mask_rows(list(op_masks) + [op_masks[-1]] * pad,
                              fos, I_0s.shape[-2:])
            if m is not None and mesh is not None:
                m = jax.device_put(m, bsh)
            mask_cache[fos] = m
        return mask_cache[fos]

    for step in range(max_step):
        if mode == "fixed":
            step_ops = [operations[step]] if step < len(operations) else []
        else:
            step_ops = list(operations)
        if not step_ops or all(s["done"] for s in states):
            break
        fos = tuple(int(op) for op in step_ops)
        n_ops = len(fos)
        n_beam = imgs.shape[1]
        allow = np.zeros((p, n_beam, n_ops), bool)
        thr = np.full((p,), np.inf, np.float32)
        for pi, st in enumerate(states):
            if st["done"]:
                continue
            if mode == "plain":
                thr[pi] = st["min_dist"]
            for j in range(len(st["sequences"])):
                used = (set() if replace else
                        {OP_NAMES.index(a[0])
                         for a in st["sequences"][j][0]})
                for i, op in enumerate(fos):
                    allow[pi, j, i] = op not in used
        allow_j, thr_j = jnp.asarray(allow), jnp.asarray(thr)
        init = jnp.asarray(F.init_candidates(fos, n_starts,
                                             key=seed + step))
        if mesh is not None:
            allow_j = jax.device_put(allow_j, bsh)
            thr_j = jax.device_put(thr_j, bsh)
            init = jax.device_put(init, rep)
        imgs, sel_d_j, sel_p_j, sel_b_j, sel_pos_j = F.fit_select_update(
            imgs, tgts, init, allow_j, thr_j, fos, n_starts, beam_size,
            n_iters=n_iters, lr=lr, dist=dist_type, masks=masks_for(fos))
        sel_d = np.asarray(sel_d_j)
        sel_params = np.asarray(sel_p_j)
        sel_beam = np.asarray(sel_b_j)
        sel_pos = np.asarray(sel_pos_j)

        for pi, st in enumerate(states):
            if st["done"]:
                continue
            cands = []
            finish = False
            for r in range(sel_d.shape[1]):
                dist = float(sel_d[pi, r])
                if not np.isfinite(dist):
                    break
                op = fos[int(sel_pos[pi, r])]
                j = int(sel_beam[pi, r])
                k = O.PARAM_COUNTS[op]
                seq = st["sequences"][j][0] + [
                    (OP_NAMES[op], sel_params[pi, r, :k].tolist(), dist)]
                cands.append((seq, dist))
                if dist < err:
                    finish = True
            if cands:
                st["min_dist"] = min(st["min_dist"], cands[0][1])
            # accepted (ascending) first, then previous sequences — the
            # exact merge fit_select_update applied to the image buffer
            st["sequences"] = (cands + st["sequences"])[:beam_size]
            if not cands or finish:
                st["done"] = True

    actions_list = [[list(seq) for seq, _ in st["sequences"]]
                    for st in states[:p_real]]
    reps = _replay_images_batch(I_0s, actions_list, op_masks,
                                max_beams=replay_beams,
                                uint8_wire=replay_uint8)
    return list(zip(actions_list, reps))


def _pad_beams(buf: np.ndarray, beam_size: int) -> np.ndarray:
    """Pad/trim the beam axis to a fixed size (repeat last row)."""
    if buf.shape[0] == beam_size:
        return buf
    if buf.shape[0] > beam_size:
        return buf[:beam_size]
    reps = np.repeat(buf[-1:], beam_size - buf.shape[0], axis=0)
    return np.concatenate([buf, reps], axis=0)
