"""Stage a GIER data workspace from the reference's REAL non-image data.

The environment ships the reference's real GIER language + split files
(2,279-token vocab, GloVe h5 (2275, 300), sess-3 annotation splits with
operator/local/mask-id metadata and the four data-mode id lists —
reference data/GIER/splits/*, data/language/GIER_*) but NOT the JPEGs or
the RLE mask blobs (data/GIER/GIER.json is a stripped large blob). This
script builds a `data/` workspace the GIER CLIs consume directly:

- copies the real vocab / operator vocab / GloVe h5 into {out}/language/,
- writes (optionally truncated) real split files into {out}/GIER/splits/
  — row order preserved; the data-mode id lists (global / shapeAlign /
  shapeAlignNonCrop / L1Thr valid) are filtered to the kept row range so
  GIER._load_ops intersection filtering works unchanged
  (reference GIER.py:76-103),
- synthesizes a deterministic image for every referenced filename under
  {out}/GIER/images/: the input is a smooth per-name gradient scene and
  the output applies a global edit (exposure / saturation / contrast from
  the output-name hash) plus — when the annotation marks local operators —
  a local brightness/desaturation edit inside synthesized instance masks,
- writes {out}/GIER/masks/{id}_{id}_mask.json RLE instance-mask files
  (uncompressed counts, the format rle_decode accepts) with one entry per
  mask id the annotation's operator dict references, so
  `is_load_mask=True` paths (GIER.resize_and_union_mask) work end-to-end.

Everything except the pixels/masks is the reference's own data; SURVEY
§2.8 GIER semantics. Consistency is pinned by tests/test_real_data.py.

  python scripts/prepare_real_gier.py --out data --limit 64
"""

import argparse
import hashlib
import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from t2onet_tpu.data.rle import rle_encode  # noqa: E402

LANGUAGE_FILES = [
    "GIER_vocabs_sess_{s}.json",
    "GIER_operator_vocabs_sess_{s}.json",
    "GIER_vocabs_glove_feat_{s}.h5",
]

_MODE_FILE_TPLS = [
    "{phase}_Ids_L1Thr_0.06_sess_{s}.json",
    "{phase}_global_sess_{s}.json",
    "{phase}_shapeAlign_sess_{s}.json",
    "{phase}_shapeAlignNonCrop_sess_{s}.json",
]


def _hash01(name: str, salt: str, n: int = 1):
    h = hashlib.sha256(f"{salt}:{name}".encode()).digest()
    vals = np.frombuffer(h[: 4 * n], dtype=np.uint32).astype(np.float64)
    out = vals / np.float64(2**32)
    return out if n > 1 else float(out[0])


def synth_input(name: str, size: int) -> np.ndarray:
    """Deterministic smooth scene for an input filename, HWC float [0,1]
    (same construction as scripts/prepare_real_fivek.py)."""
    r = _hash01(name, "scene", 8)
    y, x = np.mgrid[0:size, 0:size].astype(np.float64) / max(size - 1, 1)
    ang = 2 * np.pi * r[0]
    g = (np.cos(ang) * x + np.sin(ang) * y + 1.0) / 2.0
    blob = np.exp(-(((x - r[1]) ** 2 + (y - r[2]) ** 2)
                    / (0.05 + 0.2 * r[3])))
    base = 0.25 + 0.5 * g
    img = np.stack([
        base * (0.6 + 0.4 * r[4]) + 0.25 * blob,
        base * (0.6 + 0.4 * r[5]) + 0.20 * blob * r[6],
        base * (0.6 + 0.4 * r[6]) + 0.15 * (1 - blob),
    ], axis=-1)
    img += 0.08 * np.sin(6.28 * (x * (1 + 2 * r[7]))[..., None])
    return np.clip(img, 0.02, 0.98)


def synth_masks(stem: str, n_masks: int, size: int) -> np.ndarray:
    """(n, size, size) uint8 instance masks: deterministic ellipses, one
    per mask id, distinct centers so unions differ per id selection."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float64) / max(size - 1, 1)
    masks = np.zeros((n_masks, size, size), np.uint8)
    for i in range(n_masks):
        r = _hash01(f"{stem}:{i}", "mask", 4)
        cx, cy = 0.2 + 0.6 * r[0], 0.2 + 0.6 * r[1]
        ax, ay = 0.08 + 0.15 * r[2], 0.08 + 0.15 * r[3]
        masks[i] = (((x - cx) / ax) ** 2 + ((y - cy) / ay) ** 2 <= 1.0)
    return masks


def synth_output(inp: np.ndarray, name: str,
                 local_mask: np.ndarray | None = None) -> np.ndarray:
    """A global edit of the input (output-name hash) plus, when the
    annotation has local operators, a local edit inside the mask union —
    shaped like the operator family so the planner can invert it."""
    r = _hash01(name, "edit", 4)
    img = inp * (2.0 ** (0.8 * (r[0] - 0.3)))            # exposure
    lum = (0.27 * img[..., 0] + 0.67 * img[..., 1]
           + 0.06 * img[..., 2])[..., None]
    img = lum + (img - lum) * (0.7 + 0.8 * r[1])         # saturation
    img = 0.5 + (img - 0.5) * (0.8 + 0.5 * r[2])         # contrast
    if local_mask is not None and local_mask.any():
        m = local_mask[..., None].astype(np.float64)
        loc = np.clip(img * (1.15 + 0.5 * r[3]), 0, 1)   # local brightness
        img = img * (1 - m) + loc * m
    return np.clip(img, 0.0, 1.0)


def _imwrite(path: str, img01: np.ndarray):
    import cv2

    bgr = (img01[..., ::-1] * 255.0).round().astype(np.uint8)
    cv2.imwrite(path, bgr, [int(cv2.IMWRITE_JPEG_QUALITY), 96])


def prepare(ref_dir: str, out_dir: str, limit=None, img_size: int = 160,
            session: int = 3, phases=("train", "val", "test")):
    split_src = os.path.join(ref_dir, "data", "GIER", "splits")
    lang_src = os.path.join(ref_dir, "data", "language")
    lang_dst = os.path.join(out_dir, "language")
    split_dst = os.path.join(out_dir, "GIER", "splits")
    img_dst = os.path.join(out_dir, "GIER", "images")
    mask_dst = os.path.join(out_dir, "GIER", "masks")
    for d in (lang_dst, split_dst, img_dst, mask_dst):
        os.makedirs(d, exist_ok=True)

    for tpl in LANGUAGE_FILES:
        f = tpl.format(s=session)
        shutil.copyfile(os.path.join(lang_src, f), os.path.join(lang_dst, f))

    counts = {}
    for phase in phases:
        f = f"{phase}_sess_{session}.json"
        with open(os.path.join(split_src, f)) as fh:
            anns = json.load(fh)
        lim = limit if phase == "train" else (max(limit // 4, 8)
                                              if limit else None)
        if lim:
            anns = anns[:lim]
        with open(os.path.join(split_dst, f), "w") as fh:
            json.dump(anns, fh)
        # data-mode id lists index split rows by position: filter to the
        # kept range so intersection filtering sees a consistent universe
        for tpl in _MODE_FILE_TPLS:
            mf = tpl.format(phase=phase, s=session)
            with open(os.path.join(split_src, mf)) as fh:
                ids = json.load(fh)
            with open(os.path.join(split_dst, mf), "w") as fh:
                json.dump([i for i in ids if i < len(anns)], fh)

        for a in anns:
            stem = a["input"].split("_")[0]
            # mask ids any operator references -> mask file needs that many
            # entries ({stem}_{stem}_mask.json, GIER.resize_and_union_mask)
            all_ids = [i for md in a["operator"].values()
                       for i in md.get("ids", []) if md.get("local")]
            masks = None
            if all_ids:
                masks = synth_masks(stem, max(all_ids) + 1, img_size)
                mpath = os.path.join(mask_dst, f"{stem}_{stem}_mask.json")
                if not os.path.exists(mpath):
                    with open(mpath, "w") as fh:
                        json.dump([rle_encode(m) for m in masks], fh)
            in_path = os.path.join(img_dst, a["input"])
            out_path = os.path.join(img_dst, a["output"])
            inp = synth_input(a["input"], img_size)
            if not os.path.exists(in_path):
                _imwrite(in_path, inp)
            if not os.path.exists(out_path):
                union = (masks[np.unique(all_ids)].sum(0) > 0
                         if masks is not None else None)
                _imwrite(out_path, synth_output(inp, a["output"], union))
        counts[phase] = len(anns)
    return counts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--out", default="data")
    p.add_argument("--limit", type=int, default=None,
                   help="truncate train split rows (val/test to limit//4)")
    p.add_argument("--img_size", type=int, default=160)
    p.add_argument("--session", type=int, default=3)
    a = p.parse_args()
    counts = prepare(a.reference, a.out, a.limit, a.img_size, a.session)
    print(f"prepared GIER workspace at {a.out}: {counts}")


if __name__ == "__main__":
    main()
