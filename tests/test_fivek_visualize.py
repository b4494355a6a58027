"""FiveKActVisualize / FiveKActDVisualize loaders (reference
FiveKdataset.py:138-265): inference-resolution items, whole top-beam
planner sequence (no trajectory truncation), and the
seq2seqGAN-disc_ops.json variant."""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def fivek_vis_root(tmp_path, rng):
    from t2onet_tpu.evals.visualize import save_img

    img_dir = tmp_path / "images"
    anno_dir = tmp_path / "annotations"
    act_dir = tmp_path / "actions"
    img_dir.mkdir(), anno_dir.mkdir(), act_dir.mkdir()

    annos = []
    for i in range(2):
        img = rng.uniform(0.2, 0.8, (3, 40, 64)).astype(np.float32)
        save_img(img, str(img_dir / f"{i:05d}_O.jpg"))
        save_img(np.clip(img * 1.2, 0, 1), str(img_dir / f"{i:05d}_E.jpg"))
        annos.append({"input": f"{i:05d}_O.jpg", "output": f"{i:05d}_E.jpg",
                      "request": "brighten the image",
                      "request_idx": [1, 5, 6, 2, 0, 0]})
        # planner schema (reference gen_greedy_seqs_FiveK.py:74): one
        # improving step + one NON-improving step — Visualize keeps both
        # (truncate=False), FiveKAct would truncate at 1
        act = {"request": "brighten the image", "init distance": 0.2,
               "operation sequence": [[["brightness", [0.3], 0.05],
                                       ["contrast", [0.1], 0.0499]]]}
        d = act_dir / f"test{i}"
        d.mkdir()
        (d / f"{i:05d}.json").write_text(json.dumps(act))
        (d / "seq2seqGAN-disc_ops.json").write_text(json.dumps(act))
    (anno_dir / "test_sess_1.json").write_text(json.dumps(annos))
    return str(img_dir), str(anno_dir), str(act_dir)


def test_fivek_act_visualize_whole_sequence(fivek_vis_root):
    from t2onet_tpu.data.fivek import FiveKActVisualize

    img_dir, anno_dir, act_dir = fivek_vis_root
    ds = FiveKActVisualize(img_dir, anno_dir, act_dir, "test",
                           op_max_len=5)
    assert len(ds) == 2
    inp, out, req_idx, ops, params, request = ds[0]
    # short-side-600 inference resolution: 40x64 -> 600x960
    assert inp.shape[0] == 3 and min(inp.shape[1:]) == 600
    assert out.shape == inp.shape
    # NO truncation: both planner steps kept (START, br, ct, END)
    assert list(ops[:4]) == [1, 3, 4, 2]
    assert params[0, 0] == pytest.approx(0.3)
    assert params[1, 0] == pytest.approx(0.1)
    assert request == "brighten the image"


def test_fivek_act_d_visualize_reads_disc_json(fivek_vis_root):
    from t2onet_tpu.data.fivek import FiveKActDVisualize

    img_dir, anno_dir, act_dir = fivek_vis_root
    ds = FiveKActDVisualize(img_dir, anno_dir, act_dir, "test",
                            op_max_len=5)
    _, _, _, ops, _, _ = ds[1]
    assert list(ops[:4]) == [1, 3, 4, 2]

    # and it really reads the disc JSON: removing it must fail
    os.unlink(os.path.join(act_dir, "test1", "seq2seqGAN-disc_ops.json"))
    with pytest.raises(FileNotFoundError):
        ds[1]
