"""Metric tests: SSIM vs an independent scipy oracle, FID sanity,
ImageEvaluator protocol."""

import numpy as np
import jax.numpy as jnp
import pytest

from t2onet_tpu.evals.metrics import (
    ImageEvaluator,
    calculate_frechet_distance,
    l1_distance,
    ssim,
)


def _ssim_oracle(img1, img2, window_size=11, sigma=1.5):
    """Direct numpy/scipy implementation of the reference SSIM formula
    (utils/ssim/__init__.py:20-40) with zero-padded 'same' convs."""
    from scipy.ndimage import convolve

    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * sigma ** 2))
    g /= g.sum()
    w = np.outer(g, g)

    def conv(x):
        out = np.zeros_like(x)
        for b in range(x.shape[0]):
            for c in range(x.shape[1]):
                out[b, c] = convolve(x[b, c], w, mode="constant")
        return out

    mu1, mu2 = conv(img1), conv(img2)
    s1 = conv(img1 * img1) - mu1 ** 2
    s2 = conv(img2 * img2) - mu2 ** 2
    s12 = conv(img1 * img2) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
    return m.mean()


def test_ssim_matches_oracle(img_batch):
    other = np.clip(img_batch + 0.1, 0, 1)
    got = float(ssim(jnp.asarray(img_batch), jnp.asarray(other)))
    want = _ssim_oracle(img_batch.astype(np.float64), other.astype(np.float64))
    assert got == pytest.approx(want, abs=1e-4)


def test_ssim_self_is_one(img_batch):
    x = jnp.asarray(img_batch)
    # interior self-SSIM is 1; zero-padded borders pull slightly below
    assert float(ssim(x, x)) > 0.97
    assert float(ssim(x, 1 - x)) < float(ssim(x, x))


def test_l1(img_batch):
    a = jnp.asarray(img_batch)
    assert float(l1_distance(a, a)) == 0.0
    assert float(l1_distance(a, a + 0.25)) == pytest.approx(0.25, abs=1e-6)


def test_frechet_distance():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (500, 8))
    b = rng.normal(0, 1, (500, 8))
    same = calculate_frechet_distance(a.mean(0), np.cov(a, rowvar=False),
                                      a.mean(0), np.cov(a, rowvar=False))
    near = calculate_frechet_distance(a.mean(0), np.cov(a, rowvar=False),
                                      b.mean(0), np.cov(b, rowvar=False))
    far = calculate_frechet_distance(a.mean(0) + 3, np.cov(a, rowvar=False),
                                     b.mean(0), np.cov(b, rowvar=False))
    assert same == pytest.approx(0, abs=1e-8)
    assert near < far


def test_evaluator_protocol(img_batch):
    ev = ImageEvaluator(features_fn=lambda x: np.asarray(x).reshape(1, -1)[:, :32])
    gt = np.clip(img_batch + 0.05, 0, 1)
    for i in range(3):
        ev.update(img_batch[i:i + 1], gt[i:i + 1], gt[i:i + 1])
    res = ev.eval()
    assert res["out_L1"] == pytest.approx(0, abs=1e-7)
    assert res["in_L1"] > 0
    assert res["out_SSIM"] > res["in_SSIM"]
    assert res["out_FID"] == pytest.approx(0, abs=1e-4)


def test_html_and_visualize(tmp_path):
    from t2onet_tpu.evals.html import HTML
    from t2onet_tpu.evals.visualize import update_web_row

    web = HTML(str(tmp_path / "web"), "t")
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (3, 16, 16)).astype(np.float32)
    steps = rng.uniform(0, 1, (3, 3, 16, 16)).astype(np.float32)
    update_web_row(web, 0, "brighten the photo", img, steps,
                   ops=[3, 4, 2], params=np.zeros((3, 24)),
                   id2op={2: "<END>", 3: "brightness", 4: "contrast"},
                   gt_img=img, attn=rng.uniform(0, 1, (3, 3)))
    web.save()
    idx = (tmp_path / "web" / "index.html").read_text()
    assert "brighten the photo" in idx
    assert (tmp_path / "web" / "images" / "00000_attn.png").exists()


def test_inception_v3_shapes():
    """Architecture smoke: random init, tiny input, 2048-d pool3 output, and
    the torchvision-name converter round-trips the param tree structure."""
    import jax
    import jax.numpy as jnp
    from t2onet_tpu.evals.inception import (
        InceptionV3Features, convert_torchvision_inception, make_features_fn)

    model = InceptionV3Features()
    # 95px (not the FID protocol's 299) keeps this an architecture-only
    # check while cutting the 1-core CPU compile several-fold; the global
    # pool makes the 2048-d output size-invariant past torchvision's
    # 75px minimum
    x = jnp.zeros((1, 3, 95, 95))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    assert feats.shape == (1, 2048)

    # converter: synthesize a torchvision-style state_dict from our own tree
    sd = {}

    def walk(tree, stats, prefix):
        for k, v in tree.items():
            p = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                s = stats.get(k, {}) if isinstance(stats, dict) else {}
                walk(v, s, p)
            elif k == "kernel":
                sd[prefix + ".weight"] = np.asarray(v).transpose(3, 2, 0, 1)
            elif k == "scale":
                sd[prefix + ".weight"] = np.asarray(v)
            elif k == "bias":
                sd[prefix + ".bias"] = np.asarray(v)

    walk(variables["params"], variables["batch_stats"], "")

    def walk_stats(tree, prefix):
        for k, v in tree.items():
            p = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk_stats(v, p)
            elif k == "mean":
                sd[prefix + ".running_mean"] = np.asarray(v)
            elif k == "var":
                sd[prefix + ".running_var"] = np.asarray(v)

    walk_stats(variables["batch_stats"], "")
    conv = convert_torchvision_inception(sd)
    # structures must match exactly and numerics round-trip
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-6),
        variables["params"], conv["params"])
    fn = make_features_fn(conv, resize=False, normalize=False)
    out = fn(jnp.zeros((1, 3, 299, 299)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(feats), atol=1e-4)


def test_ssim_np_matches_device(img_batch):
    from t2onet_tpu.evals.metrics import ssim, ssim_np
    import jax.numpy as jnp

    other = np.clip(img_batch + 0.07, 0, 1)
    a = float(ssim(jnp.asarray(img_batch), jnp.asarray(other)))
    b = ssim_np(img_batch, other)
    assert abs(a - b) < 1e-4
