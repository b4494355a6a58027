"""Beam-search operation planning (plain / eps-greedy / fixed-order).

Control flow matches the reference planner (reference: utils/beam_search.py
:196-264; eps-greedy variant beam_search_eps_greedy.py:283-302; fixed-order
variant beam_search_fixed_order.py:250) — but all the compute (parameter
fitting + operator execution + distances for every beam x op x restart)
happens in ONE jitted device call per step via planner.fit. The host only
does tiny list bookkeeping over <= beam_size sequences.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

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
    onehot_rows = []
    cand_ops = F.candidate_op_slots(op_slots, n_starts)
    for op in cand_ops:
        onehot_rows.append(np.eye(bank.N_OPS + 1, dtype=np.float32)[op + 1])
    onehot = jnp.asarray(np.stack(onehot_rows))
    init = jnp.asarray(F.init_candidates(op_slots, n_starts, key=init_key))
    imgs = jnp.asarray(I_buff)
    n_real = imgs.shape[0]
    masks = None
    # a dict is one pair's {op: mask}; a list is per-row dicts. A list of
    # all-EMPTY dicts means no local ops anywhere — skip the masked
    # execute path instead of materializing an all-ones (N,C,1,H,W)
    # tensor. (len(), not truthiness: op index 0 is a valid dict key.)
    has_masks = (len(op_masks) > 0 if isinstance(op_masks, dict)
                 else any(len(d) > 0 for d in op_masks)) \
        if op_masks is not None else False
    if has_masks:
        h, w = I_buff.shape[-2:]

        def cand_rows(d):
            return np.stack([d.get(int(op), np.ones((1, h, w), np.float32))
                             for op in cand_ops])

        if isinstance(op_masks, dict):          # shared across rows (C,...)
            masks = jnp.asarray(cand_rows(op_masks))
        else:                                   # per-row list -> (N, C, ...)
            masks = jnp.asarray(np.stack([cand_rows(d) for d in op_masks]))
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
        onehot = jax.device_put(onehot, rep)
        init = jax.device_put(init, rep)
        if masks is not None:
            masks = jax.device_put(masks,
                                   bsh if masks.ndim == 5 else rep)
    if score_fn is not None:
        params, dists = F.fit_op_params_scored(
            imgs, onehot, init, score_fn, score_aux,
            n_iters=n_iters, lr=lr, masks=masks)
    else:
        params, dists = F.fit_op_params(
            imgs, jnp.asarray(target), onehot, init,
            n_iters=n_iters, lr=lr, masks=masks, dist=dist_type)
    outs = F.execute_candidates(imgs, onehot, params, masks)
    return (np.asarray(params)[:n_real], np.asarray(dists)[:n_real],
            np.asarray(outs)[:n_real], cand_ops)


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
        if fit_ops:
            params, dists, outs, cand_ops = _fit_step(
                I_buff, I_gt, fit_ops, n_starts, n_iters, lr,
                init_key=seed + step, op_masks=op_masks,
                dist_type=dist_type, score_fn=score_fn,
                score_aux=score_aux)
        else:                                     # inpaint-only search
            cand_ops = np.empty(0, np.int64)

        all_candidates, I_tmp = [], []
        no_update, finish = True, False
        tmp_min = []
        for j in range(len(sequences)):
            used = ([] if replace else
                    [OP_NAMES.index(a[0]) for a in sequences[j][0]])
            for op in step_ops:
                if op in used:
                    continue
                if op == INPAINT and inp_outs is not None:
                    dist = float(inp_dists[j])
                    p_list = [0.0] * O.PARAM_COUNTS[op]
                    out_img = inp_outs[j]
                else:
                    cols = np.where(cand_ops == op)[0]
                    best = cols[int(np.argmin(dists[j, cols]))]
                    dist = float(dists[j, best])
                    k = O.PARAM_COUNTS[op]
                    p_list = params[j, best, :k].tolist()
                    out_img = outs[j, best]
                accept = (dist < min_dist) if mode == "plain" else True
                if accept:
                    tmp_min.append(dist)
                    seq = sequences[j][0] + [(OP_NAMES[op], p_list, dist)]
                    all_candidates.append((seq, dist))
                    I_tmp.append(out_img)
                    no_update = False
                    if dist < err:
                        finish = True
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
    """Recompute per-step images for each surviving beam (host->device,
    tiny). The reference keeps them alongside candidates; recomputing the
    <= beam*step survivors costs less than hauling every candidate image."""
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
    :return: list of per-pair (actions, images) like beam_search's.
    """
    if mode not in ("plain", "eps", "fixed"):
        raise ValueError(f"unknown beam-search mode {mode!r} "
                         "(want plain | eps | fixed)")
    rng = np.random.default_rng(seed)
    dist_type = normalize_dist_type(dist_type)
    if mode == "fixed":
        beam_size = 1
    p = I_0s.shape[0]
    # per-pair host state
    states = [{
        "min_dist": float("inf"),
        "sequences": [([], float("inf"))],
        "done": False,
    } for _ in range(p)]
    I_buff = I_0s[:, None].copy()                 # (P, n_beam, 3, H, W)

    for step in range(max_step):
        if mode == "fixed":
            step_ops = [operations[step]] if step < len(operations) else []
        else:
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
            flat, tgt, step_ops, n_starts, n_iters, lr, init_key=seed + step,
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
                        [OP_NAMES.index(a[0]) for a in st["sequences"][j][0]])
                for op in step_ops:
                    if op in used:
                        continue
                    cols = np.where(cand_ops == op)[0]
                    best = cols[int(np.argmin(dists[pi, j, cols]))]
                    dist = float(dists[pi, j, best])
                    k = O.PARAM_COUNTS[op]
                    accept = (dist < st["min_dist"]) if mode == "plain" else True
                    if accept:
                        tmp_min.append(dist)
                        seq = st["sequences"][j][0] + [
                            (OP_NAMES[op], params[pi, j, best, :k].tolist(),
                             dist)]
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
            if mode == "eps" and rng.random() < eps:
                order = rng.permutation(len(all_candidates))
            keep = order[:beam_size]
            st["sequences"] = [all_candidates[i] for i in keep]
            buf = np.stack([I_tmp[i] for i in keep])
            next_buff.append(_pad_beams(buf, beam_size))
            if no_update or finish:
                st["done"] = True
        I_buff = np.stack(next_buff)

    results = []
    for pi, st in enumerate(states):
        actions = [list(seq) for seq, _ in st["sequences"]]
        results.append((actions, _replay_images(
            I_0s[pi:pi + 1], actions,
            op_masks[pi] if op_masks is not None else None)))
    return results


def _pad_beams(buf: np.ndarray, beam_size: int) -> np.ndarray:
    """Pad/trim the beam axis to a fixed size (repeat last row)."""
    if buf.shape[0] == beam_size:
        return buf
    if buf.shape[0] > beam_size:
        return buf[:beam_size]
    reps = np.repeat(buf[-1:], beam_size - buf.shape[0], axis=0)
    return np.concatenate([buf, reps], axis=0)
