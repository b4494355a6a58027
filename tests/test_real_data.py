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
