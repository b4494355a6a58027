"""uint8 wire format: 8-bit images over the host->device boundary with
on-device /255 normalization (data/fivek.load_train_img dtype=uint8 +
data/loader.device_put_batch). Numeric contract: within 1 ulp of the
float32 path (XLA turns the constant division into a reciprocal
multiply), i.e. ~5 orders of magnitude below JPEG quantization."""

import numpy as np
import pytest

from t2onet_tpu.data.loader import device_put_batch


@pytest.fixture(scope="module")
def jpg(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    path = str(tmp_path_factory.mktemp("imgs") / "t.jpg")
    cv2.imwrite(path, img)
    return path


def test_u8_load_matches_float_path(jpg):
    from t2onet_tpu.data.fivek import load_train_img

    f = load_train_img(jpg, 16)
    u = load_train_img(jpg, 16, np.uint8)
    assert f.dtype == np.float32 and u.dtype == np.uint8
    assert f.shape == u.shape == (3, 16, 16)
    # host-side /255 of the same uint8 pixels is bit-identical
    assert np.array_equal(f, u.astype(np.float32) / 255.0)


def test_device_put_batch_normalizes_u8_only(jpg):
    from t2onet_tpu.data.fivek import load_train_img

    u = load_train_img(jpg, 16, np.uint8)[None]
    tokens = np.arange(8, dtype=np.int32).reshape(1, 8)
    params = np.ones((1, 3), np.float32) * 0.5
    out = device_put_batch({"img_x": u, "x": tokens, "gt_params": params,
                            "req": ["brighten"]})
    assert out["img_x"].dtype == np.dtype("float32")
    f = load_train_img(jpg, 16)[None]
    np.testing.assert_allclose(np.asarray(out["img_x"]), f, atol=3e-7)
    # non-image dtypes pass through untouched
    assert out["x"].dtype == np.dtype("int32")
    assert np.array_equal(np.asarray(out["x"]), tokens)
    assert out["gt_params"].dtype == np.dtype("float32")
    assert np.array_equal(np.asarray(out["gt_params"]), params)
    assert out["req"] == ["brighten"]


def test_fivek_act_emits_u8_wire(tmp_path):
    """FiveKAct(wire_dtype=uint8) yields uint8 image batches whose
    normalized values match the float32-configured dataset exactly."""
    cv2 = pytest.importorskip("cv2")
    import json

    from t2onet_tpu.data.fivek import FiveKAct

    img_dir = tmp_path / "images"
    anno_dir = tmp_path / "annotations"
    act_dir = tmp_path / "acts"
    img_dir.mkdir(), anno_dir.mkdir()
    rng = np.random.default_rng(3)
    rows = []
    for i in range(2):
        for tag in ("in", "out"):
            cv2.imwrite(str(img_dir / f"{i}_{tag}.jpg"),
                        rng.integers(0, 256, (24, 31, 3), dtype=np.uint8))
        rows.append({"input": f"{i}_in.jpg", "output": f"{i}_out.jpg",
                     "request": "brighten it", "request_idx": [4, 5]})
        d = act_dir / f"train{i}"
        d.mkdir(parents=True)
        cv2.imwrite(str(d / "edit0.jpg"),
                    rng.integers(0, 256, (24, 31, 3), dtype=np.uint8))
        with open(d / f"{i:05d}.json", "w") as f:
            json.dump({"request": "brighten it", "init distance": 0.3,
                       "operation sequence": [[["brightness", [0.2], 0.1]]]},
                      f)
    with open(anno_dir / "train_sess_1.json", "w") as f:
        json.dump(rows, f)

    kw = dict(img_dir=str(img_dir), anno_dir=str(anno_dir),
              act_dir=str(act_dir), phase="train", train_img_size=16,
              op_max_len=3)
    ds_u8 = FiveKAct(wire_dtype=np.uint8, **kw)
    ds_f32 = FiveKAct(**kw)
    bu = next(ds_u8.batches(2, 1, shuffle=False))
    bf = next(ds_f32.batches(2, 1, shuffle=False))
    assert bu["img_x"].dtype == np.uint8
    assert bu["img_y"].dtype == np.uint8
    assert np.array_equal(bu["img_x"].astype(np.float32) / 255.0,
                          bf["img_x"])
    assert np.array_equal(bu["img_y"].astype(np.float32) / 255.0,
                          bf["img_y"])
    # non-image fields unaffected by the wire dtype
    for k in ("x", "y", "gt_params"):
        assert np.array_equal(bu[k], bf[k])
