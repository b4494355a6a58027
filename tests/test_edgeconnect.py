"""EdgeConnect generator parity vs a plain-torch oracle.

The reference's inpaint operator runs EdgeConnect checkpoints
(models/operators.py:625-682) from a non-vendored submodule; the oracle
here is the public EdgeConnect generator math written inline in torch
(reflection-pad convs, InstanceNorm, dilated residual blocks,
ConvTranspose2d(4,2,1)), weight-shared with our flax modules through
`convert_edgeconnect_gen` — proving checkpoint interop without the
pretrained weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from t2onet_tpu.models.edgeconnect import (  # noqa: E402
    EdgeGenerator, InpaintGenerator, canny_edges, convert_edgeconnect_gen,
    make_edgeconnect_inpaint_fn)


def _inorm_t(x):
    return F.instance_norm(x, eps=1e-5)


def _oracle_backbone(sd, x, out_channels):
    """Plain-torch EdgeConnect generator trunk on a state_dict."""
    def conv(name, x, stride=1, pad=0, dil=1):
        return F.conv2d(x, sd[f"{name}.weight"], sd[f"{name}.bias"],
                        stride, pad, dil)

    x = F.pad(x, (3, 3, 3, 3), mode="reflect")
    x = torch.relu(_inorm_t(conv("encoder.1", x)))
    x = torch.relu(_inorm_t(conv("encoder.4", x, stride=2, pad=1)))
    x = torch.relu(_inorm_t(conv("encoder.7", x, stride=2, pad=1)))
    for i in range(8):
        y = F.pad(x, (2, 2, 2, 2), mode="reflect")
        y = torch.relu(_inorm_t(conv(f"middle.{i}.conv_block.1", y, dil=2)))
        y = F.pad(y, (1, 1, 1, 1), mode="reflect")
        y = _inorm_t(conv(f"middle.{i}.conv_block.5", y))
        x = x + y
    x = F.conv_transpose2d(x, sd["decoder.0.weight"], sd["decoder.0.bias"],
                           stride=2, padding=1)
    x = torch.relu(_inorm_t(x))
    x = F.conv_transpose2d(x, sd["decoder.3.weight"], sd["decoder.3.bias"],
                           stride=2, padding=1)
    x = torch.relu(_inorm_t(x))
    x = F.pad(x, (3, 3, 3, 3), mode="reflect")
    return conv("decoder.7", x)


def _mk_sd(rng, cin, cout_final, spectral=False):
    """Random EdgeConnect generator state_dict (torch naming)."""
    sd = {}

    def add_conv(name, ci, co, k):
        w = rng.standard_normal((co, ci, k, k)).astype(np.float32) * 0.08
        sd[f"{name}.weight"] = torch.from_numpy(w)
        sd[f"{name}.bias"] = torch.from_numpy(
            rng.standard_normal(co).astype(np.float32) * 0.05)

    def add_convT(name, ci, co):
        w = rng.standard_normal((ci, co, 4, 4)).astype(np.float32) * 0.08
        sd[f"{name}.weight"] = torch.from_numpy(w)
        sd[f"{name}.bias"] = torch.from_numpy(
            rng.standard_normal(co).astype(np.float32) * 0.05)

    add_conv("encoder.1", cin, 64, 7)
    add_conv("encoder.4", 64, 128, 4)
    add_conv("encoder.7", 128, 256, 4)
    for i in range(8):
        add_conv(f"middle.{i}.conv_block.1", 256, 256, 3)
        add_conv(f"middle.{i}.conv_block.5", 256, 256, 3)
    add_convT("decoder.0", 256, 128)
    add_convT("decoder.3", 128, 64)
    add_conv("decoder.7", 64, cout_final, 7)

    if spectral:
        # reparameterize ONE layer as spectral-norm to exercise the
        # resolver: weight -> weight_orig * 2, u/v s.t. sigma == 2
        base = "encoder.1"
        w = sd.pop(f"{base}.weight")
        wm = (2.0 * w).reshape(w.shape[0], -1)
        u, s, vh = torch.linalg.svd(wm, full_matrices=False)
        sd[f"{base}.weight_orig"] = 2.0 * w
        sd[f"{base}.weight_u"] = u[:, 0]
        sd[f"{base}.weight_v"] = vh[0]
    return sd


@pytest.mark.parametrize("kind", ["edge", "inpaint"])
def test_generator_matches_torch_oracle(kind):
    rng = np.random.default_rng(0 if kind == "edge" else 1)
    cin = 3 if kind == "edge" else 4
    cout = 1 if kind == "edge" else 3
    sd = _mk_sd(rng, cin, cout, spectral=(kind == "edge"))

    x = rng.uniform(0, 1, (2, cin, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = _oracle_backbone(
            {k: (v if not k.endswith(("weight_orig", "weight_u", "weight_v"))
                 else v)
             for k, v in sd.items()} if kind != "edge" else _resolved(sd),
            torch.from_numpy(x), cout)
        if kind == "edge":
            ref = torch.sigmoid(ref)
        else:
            ref = (torch.tanh(ref) + 1) / 2
    ref = ref.numpy()

    variables = convert_edgeconnect_gen(sd, kind)
    model = EdgeGenerator() if kind == "edge" else InpaintGenerator()
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def _resolved(sd):
    """state_dict with spectral-norm layers resolved for the oracle."""
    from t2onet_tpu.models.edgeconnect import _resolve_spectral

    out = dict(sd)
    bases = {k.rsplit(".", 1)[0] for k in sd if k.endswith("weight_orig")}
    for b in bases:
        out[f"{b}.weight"] = _resolve_spectral(sd, b)
        for suf in ("weight_orig", "weight_u", "weight_v"):
            out.pop(f"{b}.{suf}")
    return out


def test_inpaint_fn_pipeline():
    """Full MODEL=3 pipeline: composite equals input outside the mask,
    finite in [0,1] inside."""
    rng = np.random.default_rng(2)
    edge_sd = _mk_sd(rng, 3, 1)
    inp_sd = _mk_sd(rng, 4, 3)
    mask = np.zeros((32, 32), np.float32)
    mask[8:20, 10:22] = 1.0
    fn = make_edgeconnect_inpaint_fn(
        convert_edgeconnect_gen(edge_sd, "edge"),
        convert_edgeconnect_gen(inp_sd, "inpaint"), mask)
    img = rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    out = np.asarray(fn(img))
    assert out.shape == img.shape
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1
    keep = mask == 0
    np.testing.assert_allclose(out[:, :, keep], img[:, :, keep], atol=1e-6)


def test_canny_edges_basic():
    """A sharp vertical step yields edge pixels along the step only."""
    g = np.zeros((32, 32), np.float32)
    g[:, 16:] = 1.0
    e = canny_edges(g, sigma=1.5)
    assert e.shape == (32, 32)
    assert e[:, 12:20].sum() > 0          # edge localized near the step
    assert e[:, :8].sum() == 0 and e[:, 24:].sum() == 0
