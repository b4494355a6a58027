"""Stage a FiveK data workspace from the reference's REAL non-image data.

The environment ships the reference's real language + annotation files
(918-token vocab, GloVe h5, request_idx rows padded to 17 — reference
data/language/*, data/FiveK/annotations/*_sess_1.json) but NOT the FiveK
JPEGs. This script builds a `data/` workspace the CLIs consume directly:

- copies the real vocab / operator vocab / GloVe h5 into {out}/language/,
- writes (optionally truncated) real annotation files into
  {out}/FiveK/annotations/ — row order preserved, so planner action dirs
  indexed by dataset position stay aligned,
- synthesizes a deterministic image for every referenced filename under
  {out}/FiveK/images/: the *_O.jpg input is a smooth per-name gradient
  scene and the *_E.jpg output is a global edit of its input (exposure /
  saturation / contrast / warmth) whose DIRECTION comes from the real
  request's keywords and whose jitter comes from the request hash — the
  language -> edit mapping is consistent across splits, so planning finds
  real operator fits and training/val/test have a learnable signal.

Everything except the pixels is the reference's own data; SURVEY §2.8
dataset semantics (request_idx consistency is asserted in
tests/test_real_data.py).

  python scripts/prepare_real_fivek.py --out data --limit 64
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

LANGUAGE_FILES = [
    "FiveK_vocabs_sess_{s}.json",
    "FiveK_operator_vocabs_sess_{s}.json",
    "FiveK_vocabs_glove_feat_{s}.h5",
]


def _hash01(name: str, salt: str, n: int = 1):
    h = hashlib.sha256(f"{salt}:{name}".encode()).digest()
    vals = np.frombuffer(h[: 4 * n], dtype=np.uint32).astype(np.float64)
    out = vals / np.float64(2**32)
    return out if n > 1 else float(out[0])


def synth_input(name: str, size: int) -> np.ndarray:
    """Deterministic smooth scene for an input filename, HWC float [0,1]."""
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


# request keyword families -> (exposure, saturation, contrast, warmth)
# direction votes. The real FiveK request language is editing-verb heavy
# ("lighten", "make it warmer", "more contrast"), so a token-level lexicon
# captures most of the edit intent.
_LEXICON = {
    "exp+": ("bright", "brighten", "brightened", "brighter", "brightness",
             "light", "lighten", "lightened", "lighter", "lighting",
             "illuminate", "illuminated", "glow", "exposure", "expose",
             "exposed", "luminous", "sunny", "daylight", "visable",
             "visible", "clearer"),
    "exp-": ("dark", "darken", "darkened", "darker", "darkness", "dim",
             "dimmer", "dimmed", "shadow", "shadows", "dusk", "night",
             "moody", "underexpose", "underexposed"),
    "sat+": ("saturate", "saturated", "saturation", "vibrant", "vibrance",
             "vivid", "colorful", "colourful", "colors", "colours", "pop",
             "rich", "richer", "intense", "punchy", "boost"),
    "sat-": ("desaturate", "desaturated", "mute", "muted", "faded", "fade",
             "washed", "pale", "gray", "grey", "grayscale", "greyscale",
             "monochrome", "bw", "bleach", "bleached", "subtle"),
    "con+": ("contrast", "contrasty", "crisp", "crisper", "dramatic",
             "dramatically", "deep", "deeper", "bold", "punch"),
    "con-": ("soft", "soften", "softer", "flat", "flatter", "hazy",
             "dreamy", "gentle", "matte"),
    "wrm+": ("warm", "warmer", "warmth", "warming", "golden", "sunset",
             "orange", "sepia", "amber", "cozy"),
    "wrm-": ("cool", "cooler", "cooling", "cold", "colder", "blue",
             "bluer", "icy", "winter", "chilly"),
}
_REDUCERS = ("less", "reduce", "reduced", "reduces", "decrease",
             "decreased", "lower", "remove", "removed", "down", "minimize")


def request_edit_scores(request: str):
    """Request text -> (exposure, saturation, contrast, warmth) scores in
    [-1, 1]. Reduction words ('reduce the exposure') flip the vote signs."""
    import re

    toks = re.findall(r"[a-z]+", request.lower())
    votes = {"exp": 0, "sat": 0, "con": 0, "wrm": 0}
    for t in toks:
        for key, words in _LEXICON.items():
            if t in words:
                votes[key[:3]] += 1 if key[3] == "+" else -1
    flip = -1.0 if any(t in _REDUCERS for t in toks) else 1.0
    return tuple(flip * float(np.clip(votes[k], -1, 1))
                 for k in ("exp", "sat", "con", "wrm"))


def synth_output(inp: np.ndarray, name: str, request: str | None = None
                 ) -> np.ndarray:
    """A global edit of the input — exposure+saturation+contrast(+warmth),
    shaped like the operator family so the planner can invert it.

    With a request (the default staging mode), the edit DIRECTION comes
    from the request's keywords and the magnitude jitter from the request
    hash, so pixels are a pure function of (input scene, request text):
    the language -> edit mapping is consistent across train/val/test and
    a seq2seq model can actually generalize. (The original name-hash mode
    made the edit independent of the request, which capped val/test at
    the identity baseline by construction.) Without a request, the edit
    falls back to the output-name hash."""
    if request is not None:
        s_exp, s_sat, s_con, s_wrm = request_edit_scores(request)
        h = _hash01(request, "reqedit", 4)
        exp_mult = 2.0 ** (0.5 * s_exp + 0.3 * (h[0] - 0.5))
        sat_fac = 1.0 + 0.45 * s_sat + 0.25 * (h[1] - 0.5)
        con_fac = 1.0 + 0.28 * s_con + 0.18 * (h[2] - 0.5)
        wrm = 0.12 * s_wrm + 0.06 * (h[3] - 0.5)
    else:
        r = _hash01(name, "edit", 4)
        exp_mult = 2.0 ** (0.8 * (r[0] - 0.3))
        sat_fac = 0.7 + 0.8 * r[1]
        con_fac = 0.8 + 0.5 * r[2]
        wrm = 0.0
    img = inp * exp_mult                                 # exposure
    lum = (0.27 * img[..., 0] + 0.67 * img[..., 1]
           + 0.06 * img[..., 2])[..., None]
    img = lum + (img - lum) * sat_fac                    # saturation
    img = 0.5 + (img - 0.5) * con_fac                    # contrast
    if wrm:
        img = img * np.asarray([1.0 + wrm, 1.0, 1.0 - wrm])  # warmth
    return np.clip(img, 0.0, 1.0)


def _imwrite(path: str, img01: np.ndarray):
    import cv2

    bgr = (img01[..., ::-1] * 255.0).round().astype(np.uint8)
    cv2.imwrite(path, bgr, [int(cv2.IMWRITE_JPEG_QUALITY), 96])


def prepare(ref_dir: str, out_dir: str, limit=None, img_size: int = 160,
            session: int = 1, phases=("train", "val", "test")):
    lang_src = os.path.join(ref_dir, "data", "language")
    lang_dst = os.path.join(out_dir, "language")
    anno_dst = os.path.join(out_dir, "FiveK", "annotations")
    img_dst = os.path.join(out_dir, "FiveK", "images")
    for d in (lang_dst, anno_dst, img_dst):
        os.makedirs(d, exist_ok=True)

    for tpl in LANGUAGE_FILES:
        f = tpl.format(s=session)
        shutil.copyfile(os.path.join(lang_src, f), os.path.join(lang_dst, f))

    counts = {}
    for phase in phases:
        f = f"{phase}_sess_{session}.json"
        with open(os.path.join(ref_dir, "data", "FiveK", "annotations", f)) as fh:
            anns = json.load(fh)
        lim = limit if phase == "train" else (max(limit // 4, 8)
                                              if limit else None)
        if lim:
            anns = anns[:lim]
        with open(os.path.join(anno_dst, f), "w") as fh:
            json.dump(anns, fh)
        for a in anns:
            in_path = os.path.join(img_dst, a["input"])
            out_path = os.path.join(img_dst, a["output"])
            if not os.path.exists(in_path):
                _imwrite(in_path, synth_input(a["input"], img_size))
            if not os.path.exists(out_path):
                inp = synth_input(a["input"], img_size)
                _imwrite(out_path, synth_output(inp, a["output"],
                                                a.get("request")))
        counts[phase] = len(anns)
    return counts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--out", default="data")
    p.add_argument("--limit", type=int, default=None,
                   help="truncate train annotations (val/test to limit//4)")
    p.add_argument("--img_size", type=int, default=160)
    p.add_argument("--session", type=int, default=1)
    a = p.parse_args()
    counts = prepare(a.reference, a.out, a.limit, a.img_size, a.session)
    print(f"prepared workspace at {a.out}: {counts}")


if __name__ == "__main__":
    main()
