"""Single-image demo: request -> operation program -> edited images.

Spec: reference demo/seq2seqL1.py — tokenize --request, load checkpoint,
greedy episode, write per-step images + a JSON of (op_name, params).

  python -m t2onet_tpu.cli.demo --img photo.jpg \
      --request "increase the brightness" --run_dir output/FiveK_trial_1
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from t2onet_tpu.cli import common
from t2onet_tpu.data.text import txt2idx
from t2onet_tpu.data.fivek import ACT2PN, load_infer_img_short_size_bounded
from t2onet_tpu.evals.visualize import save_img
from t2onet_tpu.train.checkpoint import CheckpointManager
from t2onet_tpu.train.loop import create_train_state, make_eval_episode


def _run_program(a, img, out_dir):
    """--program mode: apply an explicit executor-op sequence (the demo
    counterpart of replaying a planner JSON), with optional --mask local
    editing and a trained --inpaint_ckpt filler for inpaint steps."""
    from t2onet_tpu.ops.operators import OP_NAMES, apply_op_by_index

    program = json.loads(a.program)
    mask = inpaint_fn = None
    if a.mask:
        from PIL import Image

        m = np.asarray(Image.open(a.mask).convert("L"), np.float32) / 255.0
        if m.shape != img.shape[2:]:
            raise SystemExit(f"--mask shape {m.shape} != image "
                             f"{img.shape[2:]}")
        mask = jnp.asarray((m > 0.5).astype(np.float32)[None, None])
    if a.inpaint_ckpt:
        if mask is None:
            raise SystemExit("--inpaint_ckpt needs --mask (the hole)")
        from t2onet_tpu.models.inpaint import load_inpaint, make_inpaint_fn

        inpaint_fn = make_inpaint_fn(*load_inpaint(a.inpaint_ckpt), mask)
    if a.edgeconnect_dir:
        if mask is None:
            raise SystemExit("--edgeconnect_dir needs --mask (the hole)")
        if inpaint_fn is not None:
            raise SystemExit("--edgeconnect_dir and --inpaint_ckpt are "
                             "mutually exclusive inpaint backends")
        from t2onet_tpu.models.edgeconnect import load_edgeconnect

        inpaint_fn = load_edgeconnect(
            os.path.join(a.edgeconnect_dir, "EdgeModel_gen.pth"),
            os.path.join(a.edgeconnect_dir, "InpaintingModel_gen.pth"),
            np.asarray(mask)[0, 0])

    save_img(img[0], os.path.join(out_dir, "input.jpg"))
    cur, steps = jnp.asarray(img), []
    for i, (name, params) in enumerate(program):
        op = OP_NAMES.index(name)              # raises on unknown op
        p_arr = jnp.zeros((1, max(ACT2PN[name], 1)), jnp.float32)
        if params:
            p_arr = jnp.asarray(np.asarray(params, np.float32)[None])
        cur = apply_op_by_index(cur, op, p_arr, mask=mask,
                                inpaint_fn=inpaint_fn)
        save_img(np.asarray(cur)[0], os.path.join(out_dir, f"step{i}.jpg"))
        steps.append({"op": name, "params": list(map(float, params or []))})
    save_img(np.asarray(cur)[0], os.path.join(out_dir, "output.jpg"))
    with open(os.path.join(out_dir, "program.json"), "w") as f:
        json.dump({"program": steps, "mask": a.mask,
                   "inpaint_ckpt": a.inpaint_ckpt}, f, indent=2)
    print(f"executed {len(steps)}-step program -> {out_dir}")


def main(argv=None):
    p = argparse.ArgumentParser()
    common.add_base_args(p)
    p.add_argument("--img", required=False, default=None)
    p.add_argument("--request", default="increase the brightness")
    p.add_argument("--out_dir", default=None)
    p.add_argument("--short_size", type=int, default=600)
    p.add_argument("--ckpt_name", default=None,
                   help="checkpoint subdir (default: auto-discover "
                        "seq2seqL1_model / seq2seqGAN_model / "
                        "seq2seqRL_model in the run dir)")
    p.add_argument("--program", default=None,
                   help="execute an explicit op program instead of "
                        "decoding one from --request: a JSON list of "
                        "[op_name, [params...]] pairs (executor names, "
                        "ops/operators.py OP_NAMES). No model needed")
    p.add_argument("--mask", default=None,
                   help="grayscale mask image for --program: nonzero = "
                        "edit region (local ops / the inpaint hole)")
    p.add_argument("--edgeconnect_dir", default=None,
                   help="dir holding EdgeConnect EdgeModel_gen.pth + "
                        "InpaintingModel_gen.pth (the reference "
                        "InpaintOperator's pretrained backend, "
                        "models/operators.py:631-649) — converted on "
                        "load, used as the inpaint filler")
    p.add_argument("--inpaint_ckpt", default=None,
                   help="trained filler (cli.train_inpaint run dir's "
                        "inpaint_model): --program inpaint steps FILL the "
                        "--mask region instead of passing through")
    a = p.parse_args(argv)
    common.maybe_force_cpu(a)
    run_dir = common.resolve_run_dir(a, record=False)
    out_dir = a.out_dir or os.path.join(run_dir, "demo")
    os.makedirs(out_dir, exist_ok=True)

    # vocab only — demo edits a user-supplied image and must not require
    # dataset annotations/images (reference demo/seq2seqL1.py)
    vocab2id, id2op, w2v = common.build_vocab_only(a)
    actor, cfg = common.build_actor(a, len(vocab2id), w2v)

    if a.img:
        img = load_infer_img_short_size_bounded(a.img, a.short_size)[None]
    else:  # no image given: procedural demo image
        y, x = np.mgrid[0:a.img_size, 0:a.img_size].astype(np.float32)
        y, x = y / (a.img_size - 1), x / (a.img_size - 1)
        img = np.clip(np.stack([0.2 + 0.5 * x, 0.25 + 0.4 * y,
                                0.3 + 0.3 * (x + y) / 2], 0), 0, 1)[None]
    if a.program:
        _run_program(a, img, out_dir)
        return
    x_idx = txt2idx(a.request, vocab2id, a.encoder_max_len).astype(np.int32)

    state = create_train_state(actor, jax.random.PRNGKey(a.manual_seed),
                               jnp.asarray(x_idx), jnp.asarray(img))
    # auto-discover the checkpoint subdir: a run dir may come from
    # train_fivek (seq2seqL1_model), convert --kind gan / train_gan
    # (seq2seqGAN_model), or train_rl (seq2seqRL_model)
    names = ([a.ckpt_name] if a.ckpt_name else
             ["seq2seqL1_model", "seq2seqGAN_model", "seq2seqRL_model"])
    for name in names:
        ckpt_dir = os.path.join(run_dir, name)
        if os.path.exists(os.path.join(ckpt_dir, "checkpoint_best")):
            state = CheckpointManager(ckpt_dir).restore(state, "best")
            print(f"loaded checkpoint from {ckpt_dir}")
            break
    else:
        print("WARNING: no checkpoint — using random init")

    eval_fn = make_eval_episode(actor)
    pred, out = eval_fn(state, {"x": jnp.asarray(x_idx),
                                "img_x": jnp.asarray(img)})

    save_img(img[0], os.path.join(out_dir, "input.jpg"))
    ops = np.asarray(out["ops"][0])
    steps = []
    from t2onet_tpu.ops.operators import OP_NAMES as exec_names
    for i, op in enumerate(ops):
        save_img(np.asarray(out["imgs"][0, i]),
                 os.path.join(out_dir, f"step{i}.jpg"))
        if int(op) >= 3:
            name = exec_names[int(op) - 3]
            pn = ACT2PN[name]
            steps.append({
                "op": name,
                "vocab_token": id2op.get(int(op), int(op)),
                "params": np.asarray(out["params"][0, i, :max(pn, 1)])
                .round(4).tolist(),
            })
        else:
            steps.append({"op": id2op.get(int(op), int(op)), "params": []})
        if int(op) == 2:          # <END>
            break
    save_img(np.asarray(pred[0]), os.path.join(out_dir, "output.jpg"))
    with open(os.path.join(out_dir, "program.json"), "w") as f:
        json.dump({"request": a.request, "steps": steps}, f, indent=2)
    print(f"request: {a.request!r}")
    print("program:", json.dumps(steps))
    print(f"wrote {out_dir}/input.jpg, step*.jpg, output.jpg, program.json")


if __name__ == "__main__":
    main()
