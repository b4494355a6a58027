"""GIER planner driver: pseudo-gt action sequences with mask conditioning.

Spec: reference preprocess/gen_greedy_seqs_GIER.py:41-97 — all 8 operators,
err 1e-3, gt masks unioned per local operator. (The reference's own call
into beam_search is broken — gen_greedy_seqs_GIER.py:71, README.md:78 —
this implements its documented intent.) Output layout is what
GIERDatasetAct consumes: {out_dir}/{data_id}/acts.json + edit{k}.jpg.

  python -m t2onet_tpu.cli.plan_gier --data_mode global --limit 32
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from t2onet_tpu.cli import common
from t2onet_tpu.cli.train_gier import _patch_parser
from t2onet_tpu.planner.beam import beam_search, init_distance
from t2onet_tpu.evals.visualize import save_img

# vocab op id -> executor index (vocab - 3); local ops carry masks
ALL_OPS = (0, 1, 2, 3, 4, 5, 6, 7)


def main(argv=None):
    _patch_parser()
    p = argparse.ArgumentParser()
    common.add_base_args(p)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--phase", default="train")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--beam_size", type=int, default=3)
    p.add_argument("--err", type=float, default=1e-3)
    p.add_argument("--mode", default="plain")
    p.add_argument("--n_starts", type=int, default=2)
    p.add_argument("--n_iters", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--dist_type", default="l1",
                   help="l1 / l2 pixel distance (reference 'L1'/'L2')")
    p.add_argument("--pair_batch", type=int, default=1,
                   help=">1: lockstep-batch pairs (incl. their local-edit "
                        "masks) into one device fit per step")
    p.add_argument("--inpaint_ckpt", default=None,
                   help="trained filler checkpoint (cli.train_inpaint run "
                        "dir's inpaint_model): the inpaint candidate then "
                        "FILLS its gt mask region instead of executing as "
                        "identity (reference: external EdgeConnect, "
                        "models/operators.py:625-682). Single-pair path "
                        "only (drop --pair_batch)")
    p.add_argument("--edgeconnect_dir", default=None,
                   help="dir holding EdgeModel_gen.pth + "
                        "InpaintingModel_gen.pth: the inpaint candidate "
                        "fills through the EdgeConnect MODEL=3 pipeline — "
                        "the reference's actual inpaint backend "
                        "(models/operators.py:625-682). Single-pair path "
                        "only; mutually exclusive with --inpaint_ckpt")
    a = p.parse_args(argv)
    a.dataset = "GIER"
    if a.session == 1:
        a.session = 3
    common.maybe_force_cpu(a)
    out_dir = a.out_dir or f"output/GIER_actions_set_{a.action_id}"
    os.makedirs(out_dir, exist_ok=True)

    from t2onet_tpu.data.gier import GIER

    gier = GIER(os.path.join(a.data_dir, "GIER"),
                os.path.join(a.data_dir, "language"), a.phase,
                data_mode=getattr(a, "data_mode", "global"),
                is_load_mask=True, session=a.session,
                train_img_size=a.img_size)

    def write_item(data_id, request, img_x, img_y, actions, images):
        item_dir = os.path.join(out_dir, data_id)
        os.makedirs(item_dir, exist_ok=True)
        info = {
            "request": request,
            "init distance": init_distance(img_x, img_y),
            "operation sequence": [[list(x) for x in seq]
                                   for seq in actions],
        }
        # teacher images FIRST, acts.json LAST: acts.json is the item's
        # completion marker (GIERDatasetAct.get_act treats its presence as
        # "done" and zero-fills missing edit{k}.jpg) — same ordering rule
        # as planner/generate.py's plan_pair (generate.py:59-64)
        for k, img in enumerate(images[0]):
            save_img(np.asarray(img)[0],
                     os.path.join(item_dir, f"edit{k}.jpg"))
        with open(os.path.join(item_dir, "acts.json"), "w") as f:
            json.dump(info, f)

    def load_pair(pair_id):
        item = gier.get_pair_item(pair_id)
        # per-op masks: vocab op id -> executor index (vocab - 3)
        op_masks = {}
        for op_vocab_id, mask in item.get("mask_dict", {}).items():
            op_masks[int(op_vocab_id) - 3] = mask[None].astype(np.float32)
        data_id = gier.op_data[pair_id]["input"].split("_")[0]
        return (item["input"][None], item["output"][None], item["request"],
                op_masks, data_id)

    kw = dict(beam_size=a.beam_size, operations=ALL_OPS,
              max_step=len(ALL_OPS), err=a.err, mode=a.mode,
              n_starts=a.n_starts, n_iters=a.n_iters, lr=a.lr,
              dist_type=a.dist_type)
    inpaint_net = None
    if a.inpaint_ckpt:
        if a.pair_batch > 1:
            raise SystemExit("--inpaint_ckpt plans pairs one at a time "
                             "(drop --pair_batch): the filler closure "
                             "captures each pair's own mask")
        if a.edgeconnect_dir:
            raise SystemExit("--inpaint_ckpt and --edgeconnect_dir are "
                             "alternative inpaint backends; pick one")
        from t2onet_tpu.models.inpaint import load_inpaint, make_inpaint_fn

        inpaint_net = load_inpaint(a.inpaint_ckpt)
    ec_vars = None
    if a.edgeconnect_dir:
        if a.pair_batch > 1:
            raise SystemExit("--edgeconnect_dir plans pairs one at a time "
                             "(drop --pair_batch): the filler closure "
                             "captures each pair's own mask")
        import torch

        from t2onet_tpu.models.edgeconnect import convert_edgeconnect_gen

        esd = torch.load(os.path.join(a.edgeconnect_dir,
                                      "EdgeModel_gen.pth"),
                         map_location="cpu", weights_only=True)
        isd = torch.load(os.path.join(a.edgeconnect_dir,
                                      "InpaintingModel_gen.pth"),
                         map_location="cpu", weights_only=True)
        ec_vars = (convert_edgeconnect_gen(esd, "edge"),
                   convert_edgeconnect_gen(isd, "inpaint"))
    pair_ids = range(a.start, len(gier))
    if a.limit is not None:
        pair_ids = list(pair_ids)[: a.limit]

    n, t0 = 0, time.time()
    if a.pair_batch > 1:
        from t2onet_tpu.planner.beam import batch_beam_search

        buf, buf_ids = [], []
        pair_ids = list(pair_ids)
        last_id = pair_ids[-1] if pair_ids else None
        for pair_id in pair_ids:
            buf.append(load_pair(pair_id))
            buf_ids.append(pair_id)
            if len(buf) >= a.pair_batch or pair_id == last_id:
                I0 = np.concatenate([b[0] for b in buf])
                Igt = np.concatenate([b[1] for b in buf])
                # seed = manual_seed + first pair id: reproducible under
                # --manual_seed and varying per batch. (Batched restarts
                # are drawn jointly across the batch, so they are NOT
                # draw-for-draw identical to the single-pair path's.)
                results = batch_beam_search(
                    I0, Igt, seed=a.manual_seed + buf_ids[0],
                    op_masks=[b[3] for b in buf], **kw)
                for (actions, images), b in zip(results, buf):
                    write_item(b[4], b[2], b[0], b[1], actions, images)
                    n += 1
                buf, buf_ids = [], []
                print(f"planned {n} pairs, "
                      f"{(time.time() - t0) / max(n, 1):.2f}s/pair",
                      flush=True)
    else:
        INPAINT_EXEC = 4                       # vocab inpaint_obj(7) - 3
        for pair_id in pair_ids:
            img_x, img_y, request, op_masks, data_id = load_pair(pair_id)
            inpaint_fn = None
            if inpaint_net is not None and INPAINT_EXEC in op_masks:
                # closure captures THIS pair's gt object mask (1,1,H,W)
                inpaint_fn = make_inpaint_fn(
                    *inpaint_net, op_masks[INPAINT_EXEC][None])
            elif ec_vars is not None and INPAINT_EXEC in op_masks:
                from t2onet_tpu.models.edgeconnect import (
                    make_edgeconnect_inpaint_fn)

                # (1,H,W) gt object mask; the fn squeezes to (H,W)
                inpaint_fn = make_edgeconnect_inpaint_fn(
                    ec_vars[0], ec_vars[1], op_masks[INPAINT_EXEC])
            actions, images = beam_search(
                img_x, img_y, seed=a.manual_seed + pair_id,
                op_masks=op_masks or None, inpaint_fn=inpaint_fn, **kw)
            write_item(data_id, request, img_x, img_y, actions, images)
            n += 1
            if n % 5 == 0:
                print(f"planned {n} pairs, "
                      f"{(time.time() - t0) / n:.2f}s/pair", flush=True)
    print(f"done: {n} pairs, {(time.time() - t0) / max(n, 1):.2f}s/pair")


if __name__ == "__main__":
    main()
