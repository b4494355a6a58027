"""Data layer tests: tokenizer, RLE, FiveK action parsing, GIER index."""

import json

import numpy as np
import pytest

from t2onet_tpu.data.rle import rle_decode, rle_encode
from t2onet_tpu.data.text import parse_sent, txt2idx
from t2onet_tpu.data.fivek import analyze_traj, parse_action_json


# ---------------------------------------------------------------------------
# tokenizer (reference text_utils.py:9-26 semantics)
# ---------------------------------------------------------------------------

def test_parse_sent():
    assert parse_sent("Increase the Brightness!") == ["increase", "the",
                                                      "brightness"]
    assert parse_sent("a b2c x 42 ok") == ["ok"]        # len-1 + digits drop


def test_txt2idx():
    vocab = {"<NONE>": 0, "<START>": 1, "<END>": 2, "<UNK>": 3,
             "increase": 4, "the": 5, "brightness": 6}
    out = txt2idx("increase the brightness", vocab, max_len=8)
    np.testing.assert_array_equal(out[0], [1, 4, 5, 6, 2, 0, 0, 0])
    out = txt2idx("zzz the", vocab, max_len=6)
    np.testing.assert_array_equal(out[0], [1, 3, 5, 2, 0, 0])


# ---------------------------------------------------------------------------
# RLE (pycocotools format)
# ---------------------------------------------------------------------------

def _counts_to_string(counts):
    """Independent encoder following the documented pycocotools format."""
    out = []
    prev2 = []
    for i, x in enumerate(counts):
        if i > 2:
            x = x - counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            if c & 0x10:
                more = x != -1
            else:
                more = x != 0
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def test_rle_uncompressed_roundtrip(rng):
    mask = (rng.uniform(size=(13, 9)) > 0.6).astype(np.uint8)
    back = rle_decode(rle_encode(mask))
    np.testing.assert_array_equal(back, mask)


def test_rle_compressed_string(rng):
    mask = (rng.uniform(size=(17, 11)) > 0.5).astype(np.uint8)
    rle = rle_encode(mask)
    s = _counts_to_string(rle["counts"])
    back = rle_decode({"size": rle["size"], "counts": s})
    np.testing.assert_array_equal(back, mask)


def test_rle_column_major():
    # one set pixel at (row 2, col 0) of a 3x2 mask: F-order offset = 2
    mask = rle_decode({"size": [3, 2], "counts": [2, 1, 3]})
    expect = np.zeros((3, 2), np.uint8)
    expect[2, 0] = 1
    np.testing.assert_array_equal(mask, expect)


# ---------------------------------------------------------------------------
# planner-action parsing (reference FiveKdataset.py:54-120)
# ---------------------------------------------------------------------------

def test_analyze_traj():
    assert analyze_traj([1.0, 0.5, 0.4, 0.399]) == 2   # 3rd step <1% gain
    assert analyze_traj([1.0, 0.999]) == 1             # floor at 1
    assert analyze_traj([1.0, 0.5, 0.25, 0.12]) == 3


def test_parse_action_json():
    act = {
        "init distance": 0.2,
        "operation sequence": [[
            ("brightness", [0.4], 0.1),
            ("tone", [2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.5], 0.05),
            ("contrast", [9.0], 0.049),     # <1% improvement + |p|>5
        ]],
    }
    op_seq, params, trunc = parse_action_json(act, op_max_len=5)
    np.testing.assert_array_equal(op_seq, [1, 3, 8, 2, 0, 0, 0])
    assert trunc == 2
    assert params[0, 0] == pytest.approx(0.4)
    # tone normalized by max-abs
    assert params[1, 0] == pytest.approx(1.0)
    assert params[1, 7] == pytest.approx(0.25)
    assert (params[2] == 0).all()


# ---------------------------------------------------------------------------
# GIER index on a synthetic fixture
# ---------------------------------------------------------------------------

@pytest.fixture
def gier_dir(tmp_path, rng):
    d = tmp_path / "GIER"
    (d / "splits").mkdir(parents=True)
    (d / "masks").mkdir()
    (d / "images").mkdir()
    vdir = tmp_path / "language"
    vdir.mkdir()
    ann = [
        {"input": "aaa_1.jpg", "output": "aaa_2.jpg",
         "operator": {"brightness": {"ids": [], "local": False},
                      "color_bg": {"ids": [0], "local": True}},
         "expert_summary": ["brighten it"], "amateur_summary": ["more light"]},
        {"input": "bbb_1.jpg", "output": "bbb_2.jpg",
         "operator": {"contrast": {"ids": [], "local": False}},
         "expert_summary": ["more contrast"], "amateur_summary": []},
        {"input": "ccc_1.jpg", "output": "ccc_2.jpg",
         "operator": {"weird_op": {"ids": [], "local": False}},
         "expert_summary": ["do weird"], "amateur_summary": []},
    ]
    with open(d / "splits" / "train_sess_3.json", "w") as f:
        json.dump(ann, f)
    with open(d / "splits" / "train_global_sess_3.json", "w") as f:
        json.dump([0, 1], f)
    with open(vdir / "GIER_vocabs_sess_3.json", "w") as f:
        json.dump({"<NONE>": 0, "<START>": 1, "<END>": 2, "<UNK>": 3,
                   "brighten": 4, "it": 5, "more": 6, "light": 7,
                   "contrast": 8}, f)
    with open(vdir / "GIER_operator_vocabs_sess_3.json", "w") as f:
        json.dump({"<NONE>": 0, "<START>": 1, "<END>": 2, "brightness": 3,
                   "contrast": 4, "saturation": 5, "hue": 6,
                   "inpaint_obj": 7, "tint": 8, "sharpness": 9,
                   "color_bg": 10}, f)
    # mask file for pair aaa
    mask = (rng.uniform(size=(8, 6)) > 0.5).astype(np.uint8)
    with open(d / "masks" / "aaa_aaa_mask.json", "w") as f:
        json.dump([rle_encode(mask)], f)
    return str(d), str(vdir)


def test_gier_index_and_modes(gier_dir):
    from t2onet_tpu.data.gier import GIER

    data_dir, vocab_dir = gier_dir
    g = GIER(data_dir, vocab_dir, "train", data_mode="global",
             is_load_mask=False, session=3)
    assert len(g) == 2                          # global filter drops idx 2
    # pair 0: 2 ops x 2 requests; pair 1: 1 op x 1 request
    assert len(g.ReqId2PairId) == 3
    assert len(g.getOp) == 3
    assert g.getOp[0] == "brightness" and g.getOp[2] == "contrast"
    assert g.OpId2OpIdx(2) == 4
    op_idx, is_local, mask_dict = g.get_op_info(0)
    assert op_idx[:2] == [3, 10] and is_local[:2] == [0, 1]
    assert list(mask_dict) == [10]
    # full mode keeps all, weird_op filtered from index
    g_full = GIER(data_dir, vocab_dir, "train", data_mode="full",
                  is_load_mask=False, session=3)
    assert len(g_full) == 3
    assert len(g_full.getOp) == 3               # weird_op not in vocab


def test_gier_union_mask(gier_dir):
    from t2onet_tpu.data.gier import GIER

    data_dir, vocab_dir = gier_dir
    g = GIER(data_dir, vocab_dir, "train", data_mode="global",
             is_load_mask=False, session=3)
    m = g.resize_and_union_mask([0], "aaa", (16, 12))
    assert m.shape == (16, 12)
    assert set(np.unique(m)) <= {0, 1}


def test_prefetcher(rng):
    from t2onet_tpu.data.loader import Prefetcher

    batches = [{"x": rng.normal(size=(2, 3)).astype(np.float32), "i": i}
               for i in range(5)]
    out = list(Prefetcher(iter(batches), depth=2))
    assert [b["i"] for b in out] == [0, 1, 2, 3, 4]

    def boom():
        yield batches[0]
        raise ValueError("boom")

    it = Prefetcher(boom())
    next(it)
    with pytest.raises(ValueError):
        list(it)


def test_bucketing():
    from t2onet_tpu.evals.bucketing import bucket_shape, pad_to_bucket

    assert bucket_shape(600, 899, 64) == (640, 960)
    assert bucket_shape(600, 2000, 64, max_side=1024) == (640, 1024)
    img = np.random.default_rng(0).uniform(0, 1, (3, 600, 899)).astype(np.float32)
    padded, (h, w) = pad_to_bucket(img, 64)
    assert padded.shape == (3, 640, 960) and (h, w) == (600, 899)
    np.testing.assert_array_equal(padded[:, :600, :899], img)
    # edge padding repeats the border
    np.testing.assert_array_equal(padded[:, 600, :899], img[:, 599, :])


def test_prefetcher_exhaustion_and_close(rng):
    from t2onet_tpu.data.loader import Prefetcher

    batches = [{"i": i} for i in range(3)]
    it = Prefetcher(iter(batches), depth=2)
    assert [b["i"] for b in it] == [0, 1, 2]
    # iterating past the sentinel keeps raising instead of blocking forever
    with pytest.raises(StopIteration):
        next(it)
    with pytest.raises(StopIteration):
        next(it)

    # close() releases a pump blocked on a full queue (abandoned iteration)
    import itertools

    inf = Prefetcher(({"i": i} for i in itertools.count()), depth=1)
    next(inf)
    inf.close()
    assert not inf._thread.is_alive()
    with pytest.raises(StopIteration):
        next(inf)

    # the stored error also survives repeated draws
    def boom():
        raise ValueError("boom")
        yield

    bad = Prefetcher(boom())
    for _ in range(2):
        with pytest.raises(ValueError):
            next(bad)


def test_bucketing_rejects_oversize_and_fit_within():
    from t2onet_tpu.evals.bucketing import fit_within, pad_to_bucket

    img = np.random.default_rng(1).uniform(
        0, 1, (3, 600, 2000)).astype(np.float32)
    # silent cropping corrupted eval metrics; oversize must raise
    with pytest.raises(ValueError):
        pad_to_bucket(img, 64, max_side=1024)
    small = fit_within(img, 1024)
    assert small.shape[0] == 3 and max(small.shape[1:]) == 1024
    # aspect preserved to rounding
    assert abs(small.shape[1] / small.shape[2] - 600 / 2000) < 2e-3
    # already-fitting images pass through untouched
    ok = np.zeros((3, 600, 899), np.float32)
    assert fit_within(ok, 1024) is ok


def test_epoch_index_batches_shuffles_first_epoch():
    """The shared iterator reshuffles at EVERY epoch boundary including
    the first (the synthetic copy had drifted to a fixed-order first
    epoch before the logic was centralized)."""
    from t2onet_tpu.data.iteration import epoch_index_batches

    rng = np.random.default_rng(0)
    first = next(epoch_index_batches(64, 16, 4, True, rng))
    assert not np.array_equal(first, np.arange(16))
    # unshuffled mode stays strictly ordered
    rng = np.random.default_rng(0)
    seq = list(epoch_index_batches(8, 4, 2, False, rng))
    np.testing.assert_array_equal(np.concatenate(seq), np.arange(8))


def test_sequential_batches_cover_every_item():
    """sequential=True yields every index once, with a short tail batch —
    the exhaustive-eval mode (the old len//bs loop dropped the tail)."""
    from t2onet_tpu.data.iteration import sequential_index_batches

    sels = list(sequential_index_batches(19, 8))
    assert [len(s) for s in sels] == [8, 8, 3]
    np.testing.assert_array_equal(np.concatenate(sels), np.arange(19))

    from t2onet_tpu.data.synthetic import SyntheticFiveK

    ds = SyntheticFiveK(n=5, img_size=8, seed=0, req_max_len=8)
    # FiveK.batches(sequential=True) shares the same index generator;
    # exercise the synthetic eval-shape path via epoch mode for contrast
    got = [b["img_x"].shape[0] for b in ds.batches(2, 3, shuffle=False)]
    assert got == [2, 2, 2]
