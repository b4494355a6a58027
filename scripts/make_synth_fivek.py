"""Materialize a synthetic dataset in the exact FiveK on-disk layout.

Writes {out}/FiveK/images/*.jpg, {out}/FiveK/annotations/{phase}_sess_1.json
and {out}/language/FiveK_vocabs_sess_1.json so the real file-based
pipeline (FiveK/FiveKAct loaders -> plan_fivek -> train_fivek -> test_fivek)
runs end-to-end exactly like the reference workflow, without the
non-redistributable MIT-Adobe images.

  python scripts/make_synth_fivek.py --out data_synth --n 256 --img_size 64
  python -m t2onet_tpu.cli.plan_fivek --data_dir data_synth --limit 256 ...
  python -m t2onet_tpu.cli.train_fivek --data_dir data_synth ...
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from t2onet_tpu.data.synthetic import SyntheticFiveK, synthetic_vocab  # noqa: E402
from t2onet_tpu.data.text import parse_sent  # noqa: E402
from t2onet_tpu.evals.visualize import save_img  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data_synth")
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--img_size", type=int, default=64)
    p.add_argument("--req_max_len", type=int, default=14)
    p.add_argument("--splits", default="0.7,0.1,0.2")
    a = p.parse_args()

    img_dir = os.path.join(a.out, "FiveK", "images")
    anno_dir = os.path.join(a.out, "FiveK", "annotations")
    lang_dir = os.path.join(a.out, "language")
    for d in (img_dir, anno_dir, lang_dir):
        os.makedirs(d, exist_ok=True)

    vocab = synthetic_vocab()
    with open(os.path.join(lang_dir, "FiveK_vocabs_sess_1.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(lang_dir,
                           "FiveK_operator_vocabs_sess_1.json"), "w") as f:
        json.dump({"<NONE>": 0, "<START>": 1, "<END>": 2, "brightness": 3,
                   "contrast": 4, "saturation": 5, "hue": 6,
                   "inpaint_obj": 7, "tint": 8, "sharpness": 9,
                   "color_bg": 10}, f)

    ratios = [float(x) for x in a.splits.split(",")]
    bounds = np.cumsum([int(r * a.n) for r in ratios[:2]]).tolist()
    phases = {"train": range(0, bounds[0]),
              "val": range(bounds[0], bounds[1]),
              "test": range(bounds[1], a.n)}

    for phase, idx_range in phases.items():
        ds = SyntheticFiveK(n=a.n, img_size=a.img_size, seed=0,
                            req_max_len=a.req_max_len, vocab2id=vocab)
        annos = []
        for i in idx_range:
            img, imgs, req_idx, ops, params, request = ds.make_item(i)
            in_name, out_name = f"{i:05d}_O.jpg", f"{i:05d}_E.jpg"
            save_img(img, os.path.join(img_dir, in_name))
            save_img(imgs[-1], os.path.join(img_dir, out_name))
            annos.append({
                "input": in_name, "output": out_name, "request": request,
                "request_idx": [int(x) for x in req_idx],
            })
        path = os.path.join(anno_dir, f"{phase}_sess_1.json")
        with open(path, "w") as f:
            json.dump(annos, f)
        print(f"{phase}: {len(annos)} pairs -> {path}")
    print(f"dataset root: {a.out} (pass as --data_dir)")


if __name__ == "__main__":
    main()
