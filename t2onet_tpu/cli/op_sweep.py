"""Per-operator parameter sweeps written as image grids.

The automated counterpart of the reference's interactive cv2.imshow unit
tests `test_exposure` ... `test_inpaint` (reference operators.py:741-910):
sweep each operator's parameter range on one image and write the results.

  python -m t2onet_tpu.cli.op_sweep --img photo.jpg --out_dir output/sweeps
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from t2onet_tpu.cli import common
from t2onet_tpu.evals.visualize import save_img

# (name, executor fn key, sweep values) — ranges per reference tests
_SWEEPS = {
    "exposure": np.arange(-3.5, 3.6, 0.5),
    "contrast": np.linspace(-1, 1, 11),
    "brightness": np.linspace(-0.3, 0.3, 11),
    "saturation": np.linspace(-0.2, 0.8, 11),
    "bnw": [0.9],
    "sharpness": np.linspace(0, 2, 11),
    "blur": np.linspace(0, 1, 11),
    "hue": np.linspace(0, 1, 11),
    "white": [1.0],
}


def main(argv=None):
    p = argparse.ArgumentParser()
    common.add_base_args(p)
    p.add_argument("--out_dir", default="output/operator_analysis")
    p.add_argument("--img", default=None,
                   help="input image (procedural gradient if omitted)")
    a = p.parse_args(argv)
    common.maybe_force_cpu(a)

    import jax.numpy as jnp

    from t2onet_tpu.ops import operators as O

    if a.img:
        from t2onet_tpu.data.fivek import load_train_img

        img = load_train_img(a.img, a.img_size)[None]
    else:
        y, x = np.mgrid[0:a.img_size, 0:a.img_size].astype(np.float32)
        y, x = y / (a.img_size - 1), x / (a.img_size - 1)
        img = np.clip(np.stack([0.25 + 0.5 * x, 0.3 + 0.4 * y,
                                0.35 + 0.3 * (x + y) / 2], 0), 0, 1)[None]
    img = jnp.asarray(img)

    for name, values in _SWEEPS.items():
        fn = O.OP_FNS[name]
        out_dir = os.path.join(a.out_dir, name)
        os.makedirs(out_dir, exist_ok=True)
        for v in values:
            out = O.mask_blend(fn(img, jnp.asarray([[float(v)]])), img)
            save_img(np.asarray(out)[0],
                     os.path.join(out_dir, f"{float(v):.2f}.jpg"))
        print(f"{name}: {len(list(values))} sweeps -> {out_dir}")

    # curve ops with random curves (reference test_tone/test_color)
    rng = np.random.default_rng(0)
    for name, k in (("tone", 8), ("color", 24)):
        out_dir = os.path.join(a.out_dir, name)
        os.makedirs(out_dir, exist_ok=True)
        for i in range(5):
            p_ = rng.uniform(0.5, 2.0, (1, k)).astype(np.float32)
            out = O.mask_blend(O.OP_FNS[name](img, jnp.asarray(p_)), img)
            save_img(np.asarray(out)[0], os.path.join(out_dir, f"{i}.jpg"))
        print(f"{name}: 5 random curves -> {out_dir}")

    # white-balance sweeps (reference test_white_balance)
    out_dir = os.path.join(a.out_dir, "whitebalance")
    os.makedirs(out_dir, exist_ok=True)
    from t2onet_tpu.ops.color import tanh_range

    for i in range(5):
        feats = (rng.uniform(size=(1, 3)).astype(np.float32) - 0.5) * 3
        feats[:, 0] = 0.0
        gains = np.exp(np.asarray(tanh_range(-0.5, 0.5)(jnp.asarray(feats))))
        lum = 1e-5 + 0.27 * gains[:, 0] + 0.67 * gains[:, 1] + 0.06 * gains[:, 2]
        gains = gains / lum[:, None]
        out = O.mask_blend(O.white_balance(img, jnp.asarray(gains)), img)
        save_img(np.asarray(out)[0], os.path.join(out_dir, f"{i}.jpg"))
    print(f"whitebalance: 5 sweeps -> {out_dir}")


if __name__ == "__main__":
    main()
