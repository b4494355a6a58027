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

    avg_time, n = 0.0, 0
    for pair_id in range(a.start, len(gier)):
        if a.limit is not None and n >= a.limit:
            break
        tik = time.time()
        item = gier.get_pair_item(pair_id)
        img_x = item["input"][None]
        img_y = item["output"][None]
        # per-op masks: vocab op id -> executor index (vocab - 3)
        op_masks = {}
        for op_vocab_id, mask in item.get("mask_dict", {}).items():
            op_masks[int(op_vocab_id) - 3] = mask[None].astype(np.float32)

        actions, images = beam_search(
            img_x, img_y, beam_size=a.beam_size, operations=ALL_OPS,
            max_step=len(ALL_OPS), err=a.err, mode=a.mode,
            n_starts=a.n_starts, n_iters=a.n_iters, lr=a.lr,
            seed=pair_id, op_masks=op_masks or None, dist_type=a.dist_type)

        data_id = gier.op_data[pair_id]["input"].split("_")[0]
        item_dir = os.path.join(out_dir, data_id)
        os.makedirs(item_dir, exist_ok=True)
        info = {
            "request": item["request"],
            "init distance": init_distance(img_x, img_y),
            "operation sequence": [[list(x) for x in seq]
                                   for seq in actions],
        }
        with open(os.path.join(item_dir, "acts.json"), "w") as f:
            json.dump(info, f)
        for k, img in enumerate(images[0]):
            save_img(np.asarray(img)[0],
                     os.path.join(item_dir, f"edit{k}.jpg"))
        n += 1
        avg_time += (time.time() - tik - avg_time) / n
        if n % 5 == 0:
            print(f"planned {n} pairs, avg {avg_time:.2f}s/pair", flush=True)
    print(f"done: {n} pairs, avg {avg_time:.2f}s/pair")


if __name__ == "__main__":
    main()
