"""The pipeline against the reference's REAL non-image data (VERDICT #3).

The environment ships the reference's real vocab (918 tokens), GloVe h5
(914 x 300), and annotation files (request_idx rows padded to 17) under
/root/reference/data — everything except the JPEGs. These tests run our
text pipeline and dataset readers directly against those files, and an
end-to-end workspace staged by scripts/prepare_real_fivek.py (real
annotations + synthesized pixels under the real filenames).
"""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "data", "language")),
    reason="reference data not available")


def test_txt2idx_reproduces_real_request_idx_rows():
    """Our tokenizer+vocab must regenerate the reference's preprocessed
    request_idx rows exactly (reference utils/text_utils.py:42-67,
    data/FiveK/annotations/*_sess_1.json)."""
    from t2onet_tpu.data.text import load_vocab, txt2idx

    vocab2id, _, op2id, _ = load_vocab(
        os.path.join(REF, "data", "language"), "FiveK", 1)
    assert len(vocab2id) == 918 and len(op2id) == 11
    for phase in ("train", "val", "test"):
        with open(os.path.join(REF, "data", "FiveK", "annotations",
                               f"{phase}_sess_{1}.json")) as f:
            anns = json.load(f)
        for a in anns[:100]:
            row = txt2idx(a["request"], vocab2id, 17)[0]
            assert (row == np.asarray(a["request_idx"])).all(), a["request"]


def test_real_glove_loads_and_injects():
    """GloVe h5 is (vocab-4, 300); the encoder embeds real rows with the
    frozen-GloVe-trainable-specials layout (reference
    lang_encoder.py:54-60)."""
    import jax
    import jax.numpy as jnp

    from t2onet_tpu.data.text import load_embedding, load_vocab
    from t2onet_tpu.models.encoder import RNNEncoder

    lang = os.path.join(REF, "data", "language")
    w2v = np.asarray(load_embedding(
        os.path.join(lang, "FiveK_vocabs_glove_feat_1.h5")))
    vocab2id, _, _, _ = load_vocab(lang, "FiveK", 1)
    assert w2v.shape == (len(vocab2id) - 4, 300)

    enc = RNNEncoder(vocab_size=len(vocab2id), word_vec_dim=300,
                     hidden_size=32, n_layers=1, word2vec=w2v,
                     fix_embedding=True)
    x = jnp.asarray([[1, 536, 28, 4, 2, 0, 0, 0]], jnp.int32)  # real row head
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x)
    emb = variables["params"]["embedding"]
    # rows 4+ must hold the actual GloVe vectors
    np.testing.assert_allclose(np.asarray(emb)[4:], w2v, rtol=1e-6)
    out, (h, c), valid = enc.apply(variables, x)
    assert np.isfinite(np.asarray(out)).all()
    assert valid[0].sum() == 5


@pytest.fixture(scope="module")
def real_workspace(tmp_path_factory):
    from scripts.prepare_real_fivek import prepare

    out = tmp_path_factory.mktemp("fivek_real")
    counts = prepare(REF, str(out), limit=8, img_size=64)
    return str(out), counts


def test_real_workspace_dataset_and_batches(real_workspace):
    """FiveK reader over real annotations + synthesized pixels under real
    filenames: real request_idx rows flow into batches unchanged."""
    out, counts = real_workspace
    from t2onet_tpu.data.fivek import FiveK

    ds = FiveK(os.path.join(out, "FiveK", "images"),
               os.path.join(out, "FiveK", "annotations"),
               "train", 1, train_img_size=64)
    assert len(ds) == counts["train"] == 8
    b = next(ds.batches(batch_size=4, steps=1, shuffle=False))
    assert b["img_x"].shape == (4, 3, 64, 64)
    assert b["x"].shape == (4, 17)
    with open(os.path.join(out, "FiveK", "annotations",
                           "train_sess_1.json")) as f:
        anns = json.load(f)
    np.testing.assert_array_equal(b["x"][0], anns[0]["request_idx"])
    assert 0.0 <= b["img_x"].min() and b["img_x"].max() <= 1.0
    # the synthesized edit is a real global shift, not a copy
    assert np.abs(b["img_x"] - b["img_y"][:, -1]).mean() > 0.01


def test_real_workspace_planner_roundtrip(real_workspace):
    """Plan one real pair on-device and reload it through FiveKAct — the
    planner JSON schema and the action loader interoperate on real
    requests/filenames (reference gen_greedy_seqs_FiveK.py:66-83 +
    FiveKdataset.py:86-120)."""
    out, _ = real_workspace
    from t2onet_tpu.cli import plan_fivek
    from t2onet_tpu.data.fivek import FiveKAct

    act_dir = os.path.join(out, "actions_set_1")
    plan_fivek.main([
        "--data_dir", out, "--phase", "train", "--out_dir", act_dir,
        "--img_size", "32", "--limit", "1", "--beam_size", "2",
        "--n_starts", "1", "--n_iters", "12", "--cpu"])
    ds = FiveKAct(os.path.join(out, "FiveK", "images"),
                  os.path.join(out, "FiveK", "annotations"),
                  act_dir, "train", 1, train_img_size=32)
    inp, outs, req_idx, ops, params, req = ds[0]
    assert ops[0] == 1 and (ops == 2).any()      # START ... END
    assert np.isfinite(params).all()


# ---------------------------------------------------------------------------
# GIER: the reference's real sess-3 splits / vocab / GloVe
# ---------------------------------------------------------------------------

def test_real_gier_vocab_and_glove_consistent():
    """Real GIER vocab (2,279 tokens incl. 4 specials) matches the GloVe
    h5 (2275, 300) with the frozen-GloVe-trainable-specials layout
    (reference data/language/GIER_*, lang_encoder.py:54-60)."""
    from t2onet_tpu.data.text import load_embedding, load_vocab

    lang = os.path.join(REF, "data", "language")
    vocab2id, _, op2id, _ = load_vocab(lang, "GIER", 3)
    w2v = np.asarray(load_embedding(
        os.path.join(lang, "GIER_vocabs_glove_feat_3.h5")))
    assert len(op2id) == 11
    assert w2v.shape == (len(vocab2id) - 4, 300)
    # specials occupy ids 0-3 exactly
    assert [vocab2id[t] for t in
            ("<NONE>", "<START>", "<END>", "<UNK>")] == [0, 1, 2, 3]


@pytest.fixture(scope="module")
def real_gier_workspace(tmp_path_factory):
    from scripts.prepare_real_gier import prepare

    out = tmp_path_factory.mktemp("gier_real")
    counts = prepare(REF, str(out), limit=24, img_size=64)
    return str(out), counts


def test_real_gier_index_and_masks(real_gier_workspace):
    """GIER index over real sess-3 rows: data-mode intersection filtering,
    request tokenization against the real vocab, and local-op mask
    loading through the staged RLE files (reference GIER.py:76-103,
    125-189, 288-307)."""
    out, counts = real_gier_workspace
    from t2onet_tpu.data.gier import GIER

    g = GIER(os.path.join(out, "GIER"), os.path.join(out, "language"),
             "train", data_mode="global", is_load_mask=True,
             train_img_size=32)
    assert 0 < len(g) <= counts["train"]
    assert len(g.vocab2id) == 2279
    # every kept row passed the global filter: the id list must admit it
    with open(os.path.join(out, "GIER", "splits",
                           "train_global_sess_3.json")) as f:
        ok_ids = set(json.load(f))
    with open(os.path.join(out, "GIER", "splits",
                           "train_sess_3.json")) as f:
        rows = json.load(f)
    kept = [i for i in range(len(rows)) if i in ok_ids]
    assert len(g) == len(kept)

    # find a request whose pair carries a local op in the 8-op vocab
    hit = None
    for rid, pid in g.ReqId2PairId.items():
        _, _, md = g.get_op_info(pid)
        if md:
            hit = rid
            break
    if hit is not None:
        item = g.get_req_item(hit)
        k, m = next(iter(item["mask_dict"].items()))
        assert m.shape == (32, 32) and 0 < m.mean() < 1
        assert set(np.unique(m)) <= {0.0, 1.0}


def test_real_gier_mode_intersection_and_batches(real_gier_workspace):
    """'global+valid' intersects the two id lists (GIER.py:76-103); the
    request-level dataset yields fixed-shape batches with real tokens."""
    out, _ = real_gier_workspace
    from t2onet_tpu.data.gier import GIER, GIERDataset

    base = GIER(os.path.join(out, "GIER"), os.path.join(out, "language"),
                "train", data_mode="global", train_img_size=32)
    both = GIER(os.path.join(out, "GIER"), os.path.join(out, "language"),
                "train", data_mode="global+valid", train_img_size=32)
    assert len(both) <= len(base)

    ds = GIERDataset(os.path.join(out, "GIER"),
                     os.path.join(out, "language"), "train",
                     data_mode="global", train_img_size=32)
    b = next(ds.batches(2, 1, shuffle=False))
    assert b["img_x"].shape == (2, 3, 32, 32)
    assert b["x"].shape == (2, 17)
    # rows start with <START>=1 and contain real (>3) vocab ids
    assert (b["x"][:, 0] == 1).all() and (b["x"] > 3).any()
    # synthesized edit is a real shift, not a copy
    assert np.abs(b["img_x"] - b["img_y"][:, -1]).mean() > 0.01
