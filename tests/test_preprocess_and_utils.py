"""Coverage for the small host-side modules: data/preprocess.py (split /
vocab / request-index precompute, reference data/FiveK/FiveK.py +
data/GIER/define_split.py), ops/color_names.py (get_color_from_name,
reference operators.py:720-733) and utils/profiling.PhaseTimer."""

import json
import os

import numpy as np


def test_define_split_partitions_by_input(tmp_path):
    from t2onet_tpu.data.preprocess import define_split

    data = [{"input": f"img{i % 10}.jpg", "output": f"out{i}.jpg",
             "request": f"brighten number {i}"} for i in range(30)]
    src = tmp_path / "all.json"
    src.write_text(json.dumps(data))
    out = str(tmp_path / "splits")
    define_split(str(src), out, session=1)

    phases = {}
    for phase in ("train", "val", "test"):
        with open(os.path.join(out, f"{phase}_sess_1.json")) as f:
            phases[phase] = json.load(f)
    # every row lands in exactly one phase
    assert sum(len(v) for v in phases.values()) == len(data)
    # the split is by unique INPUT image: no input crosses phases
    owners = {}
    for phase, rows in phases.items():
        for r in rows:
            assert owners.setdefault(r["input"], phase) == phase
    # 70/10/20 over the 10 unique inputs
    uniq = {p: len({r["input"] for r in rows}) for p, rows in phases.items()}
    assert uniq == {"train": 7, "val": 1, "test": 2}

    # idempotent: a second call is a no-op, not an overwrite
    define_split(str(src), out, session=1)


def test_build_vocab_and_txt2idx_roundtrip(tmp_path):
    from t2onet_tpu.data.preprocess import (build_vocab, define_split,
                                            save_txt2idx)

    reqs = ["brighten the image", "darken the image", "add contrast"]
    vocab = build_vocab(reqs)
    assert [k for k, v in sorted(vocab.items(), key=lambda kv: kv[1])][:4] \
        == ["<NONE>", "<START>", "<END>", "<UNK>"]
    for tok in ("brighten", "darken", "contrast", "image", "the", "add"):
        assert tok in vocab

    data = [{"input": "a.jpg", "output": "b.jpg", "request": r}
            for r in reqs * 4]
    src = tmp_path / "all.json"
    src.write_text(json.dumps(data))
    split_dir = str(tmp_path / "splits")
    define_split(str(src), split_dir, session=1, ratios=(0.4, 0.3, 0.3))
    anno = str(tmp_path / "annotations")
    save_txt2idx(split_dir, anno, vocab, session=1, max_len=6)
    with open(os.path.join(anno, "train_sess_1.json")) as f:
        rows = json.load(f)
    for row in rows:
        idx = row["request_idx"]
        # START + body + END, padded with NONE=0 (FiveK.py:56-93 layout)
        assert idx[0] == 1 and 2 in idx
        body = [i for i in idx if i not in (0, 1, 2)]
        toks = [t for t in row["request"].split() if len(t) > 1]
        assert len(body) == len(toks)
        # unknown-free: every token of these requests is in-vocab
        assert all(i >= 4 for i in body)


def test_get_color_from_name_substring_contract():
    from t2onet_tpu.ops.color_names import get_color_from_name

    hs, names = get_color_from_name("blue")
    assert set(names) >= {"blue", "dark blue", "light blue"}
    assert len(hs) == len(names)
    for h, s in hs:
        assert 0.0 <= h < 1.0 and 0.0 <= s <= 1.0
    # pure blue: hue 2/3, full saturation
    blue = hs[names.index("blue")]
    np.testing.assert_allclose(blue, [2.0 / 3.0, 1.0], atol=1e-6)

    # user JSON override (the reference's name_hsv_map.json path)
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump({"mycolor": [0.25, 0.5, 1.0]}, f)
        path = f.name
    hs2, names2 = get_color_from_name("mycolor", map_path=path)
    assert names2 == ["mycolor"] and hs2 == [[0.25, 0.5]]
    os.unlink(path)


def test_phase_timer_averages():
    from t2onet_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    for _ in range(3):
        with t.phase("a"):
            pass
    assert t.avg("a") >= 0.0
    s = t.summary()
    assert s["a"]["n"] == 3
    assert s["a"]["p50"] >= 0.0
    assert "a" in t.report()
