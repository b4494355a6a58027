"""Per-sample web-gallery rows + attention heatmaps.

Capability spec: reference utils/visualize.py — rows of input/step-images
with op+param captions (update_web_row_s, visualize.py:33-64), gt rows,
and attention heatmaps (showAttention matshow, visualize.py:140-162).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def save_img(img_chw: np.ndarray, path: str):
    """(3,H,W) float [0,1] -> jpg/png on disk."""
    import cv2

    arr = (np.clip(np.asarray(img_chw), 0, 1).transpose(1, 2, 0) * 255
           ).astype(np.uint8)
    cv2.imwrite(path, arr[:, :, ::-1])          # RGB -> BGR for cv2


def show_attention(request_tokens: Sequence[str], op_names: Sequence[str],
                   attn: np.ndarray, path: str):
    """Attention heatmap (ops x request tokens) — reference
    visualize.py:140-162."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(max(4, len(request_tokens) * 0.6),
                                    max(2, len(op_names) * 0.5)))
    im = ax.matshow(np.asarray(attn)[: len(op_names), : len(request_tokens)],
                    cmap="viridis")
    ax.set_xticks(range(len(request_tokens)))
    ax.set_xticklabels(request_tokens, rotation=60, fontsize=8)
    ax.set_yticks(range(len(op_names)))
    ax.set_yticklabels(op_names, fontsize=8)
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def update_web_row(webpage, sample_id: int, request: str,
                   input_img: np.ndarray, step_imgs: np.ndarray,
                   ops: Sequence[int], params: np.ndarray,
                   id2op: dict, gt_img: Optional[np.ndarray] = None,
                   attn: Optional[np.ndarray] = None,
                   trim_params: int = 3):
    """One gallery row: input, each executed step (caption: op + params),
    optional gt, optional attention heatmap."""
    img_dir = webpage.get_image_dir()
    webpage.add_header(f"[{sample_id}] {request}")
    ims, txts = [], []

    name = f"{sample_id:05d}_input.jpg"
    save_img(input_img, os.path.join(img_dir, name))
    ims.append(name)
    txts.append("input")

    for i, op in enumerate(ops):
        op = int(op)
        name = f"{sample_id:05d}_step{i}.jpg"
        save_img(step_imgs[i], os.path.join(img_dir, name))
        ims.append(name)
        p = np.asarray(params[i]).ravel()[:trim_params]
        txts.append(f"{id2op.get(op, op)} {np.round(p, 3).tolist()}")

    if gt_img is not None:
        name = f"{sample_id:05d}_gt.jpg"
        save_img(gt_img, os.path.join(img_dir, name))
        ims.append(name)
        txts.append("ground truth")

    if attn is not None:
        name = f"{sample_id:05d}_attn.png"
        # label exactly the positions the encoder consumed: txt2idx
        # builds [START, w1..wk, END, pads] (data/text.py), so column 0
        # is START attention and the last labeled column is END — raw
        # split() (or unshifted parse_sent) misattributes every column
        from t2onet_tpu.data.text import parse_sent

        # clamp to the columns the encoder actually consumed: txt2idx
        # truncates to max_len-2 words, so a longer request would push
        # '</s>' past the real END column and mislabel it
        n_words = int(np.asarray(attn).shape[-1]) - 2
        toks = ["<s>"] + parse_sent(request)[:n_words] + ["</s>"]
        ops_names = [str(id2op.get(int(o), o)) for o in ops]
        show_attention(toks, ops_names, attn, os.path.join(img_dir, name))
        ims.append(name)
        txts.append("attention")

    webpage.add_images(ims, txts)
