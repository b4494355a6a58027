"""Architecture-level parity of the FID-variant InceptionV3 blocks.

The reference's FID protocol defaults to pytorch-fid's patched
`fid_inception_v3` (use_fid_inception=True, reference
utils/FID/inception.py:36, 79): pad-EXCLUDING average branch pools in
InceptionA/C/E_1 and a MAX branch pool in E_2/Mixed_7c
(inception.py:193-307). torchvision isn't in this environment, so the
oracle here is the patched block math written in plain torch (conv + eval
BN + relu per BasicConv2d), weight-shared with our flax blocks through
convert_torchvision_inception.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402

from t2onet_tpu.evals.inception import (  # noqa: E402
    InceptionA, InceptionE, convert_torchvision_inception)


def _mk_conv(rng, key, cin, cout, kh, kw, sd):
    w = rng.standard_normal((cout, cin, kh, kw)).astype(np.float32) * 0.1
    sd[f"{key}.conv.weight"] = torch.from_numpy(w)
    sd[f"{key}.bn.weight"] = torch.from_numpy(
        rng.uniform(0.5, 1.5, cout).astype(np.float32))
    sd[f"{key}.bn.bias"] = torch.from_numpy(
        rng.standard_normal(cout).astype(np.float32) * 0.1)
    sd[f"{key}.bn.running_mean"] = torch.from_numpy(
        rng.standard_normal(cout).astype(np.float32) * 0.1)
    sd[f"{key}.bn.running_var"] = torch.from_numpy(
        rng.uniform(0.5, 1.5, cout).astype(np.float32))


def _apply_conv(sd, key, x, stride=1, padding=0):
    x = F.conv2d(x, sd[f"{key}.conv.weight"], None, stride, padding)
    x = F.batch_norm(x, sd[f"{key}.bn.running_mean"],
                     sd[f"{key}.bn.running_var"], sd[f"{key}.bn.weight"],
                     sd[f"{key}.bn.bias"], training=False, eps=1e-3)
    return F.relu(x)


def _strip_prefix(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def test_fid_inception_a_matches_torch_oracle():
    """FIDInceptionA: count_include_pad=False branch pool
    (reference inception.py:193-216)."""
    rng = np.random.default_rng(0)
    sd = {}
    cin, pf = 192, 32
    _mk_conv(rng, "M.branch1x1", cin, 64, 1, 1, sd)
    _mk_conv(rng, "M.branch5x5_1", cin, 48, 1, 1, sd)
    _mk_conv(rng, "M.branch5x5_2", 48, 64, 5, 5, sd)
    _mk_conv(rng, "M.branch3x3dbl_1", cin, 64, 1, 1, sd)
    _mk_conv(rng, "M.branch3x3dbl_2", 64, 96, 3, 3, sd)
    _mk_conv(rng, "M.branch3x3dbl_3", 96, 96, 3, 3, sd)
    _mk_conv(rng, "M.branch_pool", cin, pf, 1, 1, sd)

    x = rng.standard_normal((2, cin, 17, 17)).astype(np.float32)
    tx = torch.from_numpy(x)
    with torch.no_grad():
        b1 = _apply_conv(sd, "M.branch1x1", tx)
        b5 = _apply_conv(sd, "M.branch5x5_2",
                         _apply_conv(sd, "M.branch5x5_1", tx), padding=2)
        bd = _apply_conv(sd, "M.branch3x3dbl_1", tx)
        bd = _apply_conv(sd, "M.branch3x3dbl_2", bd, padding=1)
        bd = _apply_conv(sd, "M.branch3x3dbl_3", bd, padding=1)
        bp = F.avg_pool2d(tx, 3, 1, 1, count_include_pad=False)
        bp = _apply_conv(sd, "M.branch_pool", bp)
        ref = torch.cat([b1, b5, bd, bp], 1).numpy()

    variables = convert_torchvision_inception(_strip_prefix(sd, "M."))
    mod = InceptionA(pf, pool_mode="avg_tf")
    out = mod.apply(variables, jax.numpy.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-4)


def _make_e_sd(rng, cin):
    sd = {}
    _mk_conv(rng, "M.branch1x1", cin, 320, 1, 1, sd)
    _mk_conv(rng, "M.branch3x3_1", cin, 384, 1, 1, sd)
    _mk_conv(rng, "M.branch3x3_2a", 384, 384, 1, 3, sd)
    _mk_conv(rng, "M.branch3x3_2b", 384, 384, 3, 1, sd)
    _mk_conv(rng, "M.branch3x3dbl_1", cin, 448, 1, 1, sd)
    _mk_conv(rng, "M.branch3x3dbl_2", 448, 384, 3, 3, sd)
    _mk_conv(rng, "M.branch3x3dbl_3a", 384, 384, 1, 3, sd)
    _mk_conv(rng, "M.branch3x3dbl_3b", 384, 384, 3, 1, sd)
    _mk_conv(rng, "M.branch_pool", cin, 192, 1, 1, sd)
    return sd


def _torch_e(sd, tx, branch_pool):
    with torch.no_grad():
        b1 = _apply_conv(sd, "M.branch1x1", tx)
        b3 = _apply_conv(sd, "M.branch3x3_1", tx)
        b3 = torch.cat([
            _apply_conv(sd, "M.branch3x3_2a", b3, padding=(0, 1)),
            _apply_conv(sd, "M.branch3x3_2b", b3, padding=(1, 0))], 1)
        bd = _apply_conv(sd, "M.branch3x3dbl_1", tx)
        bd = _apply_conv(sd, "M.branch3x3dbl_2", bd, padding=1)
        bd = torch.cat([
            _apply_conv(sd, "M.branch3x3dbl_3a", bd, padding=(0, 1)),
            _apply_conv(sd, "M.branch3x3dbl_3b", bd, padding=(1, 0))], 1)
        bp = _apply_conv(sd, "M.branch_pool", branch_pool(tx))
        return torch.cat([b1, b3, bd, bp], 1).numpy()


@pytest.mark.parametrize("variant,pool_mode", [
    ("E_1_avg_nopad", "avg_tf"),    # FIDInceptionE_1, inception.py:247-277
    ("E_2_maxpool", "max"),         # FIDInceptionE_2, inception.py:279-307
    ("torchvision", "avg_tv"),      # unpatched torchvision InceptionE
])
def test_fid_inception_e_matches_torch_oracle(variant, pool_mode):
    rng = np.random.default_rng(1)
    cin = 128    # reduced width — same wiring, faster test
    sd = _make_e_sd(rng, cin)
    x = rng.standard_normal((2, cin, 8, 8)).astype(np.float32)
    tx = torch.from_numpy(x)

    pools = {
        "avg_tf": lambda t: F.avg_pool2d(t, 3, 1, 1,
                                         count_include_pad=False),
        "max": lambda t: F.max_pool2d(t, 3, 1, 1),
        "avg_tv": lambda t: F.avg_pool2d(t, 3, 1, 1),
    }
    ref = _torch_e(sd, tx, pools[pool_mode])

    variables = convert_torchvision_inception(_strip_prefix(sd, "M."))
    mod = InceptionE(pool_mode=pool_mode)
    out = mod.apply(variables, jax.numpy.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-4)


def test_variants_differ_only_in_mixed7c_pool():
    """fid_variant flips the Mixed_7c branch pool from avg to max — the
    two E-variants must disagree on generic inputs (guards against the
    flag silently not reaching the block)."""
    rng = np.random.default_rng(2)
    cin = 64
    sd = _make_e_sd(rng, cin)
    # rebuild with smaller channel dims consistent with cin=64
    x = rng.standard_normal((1, cin, 6, 6)).astype(np.float32)
    variables = convert_torchvision_inception(_strip_prefix(sd, "M."))
    o_max = InceptionE(pool_mode="max").apply(
        variables, jax.numpy.asarray(x.transpose(0, 2, 3, 1)))
    o_avg = InceptionE(pool_mode="avg_tv").apply(
        variables, jax.numpy.asarray(x.transpose(0, 2, 3, 1)))
    assert float(np.abs(np.asarray(o_max) - np.asarray(o_avg)).max()) > 1e-3
