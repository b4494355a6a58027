"""First-party inpainting backend (the inpaint operator slot; reference
InpaintOperator delegates to external EdgeConnect, operators.py:625-682)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from t2onet_tpu.models.inpaint import (
    InpaintNet, compose, inpaint_loss, load_inpaint, make_inpaint_fn,
    make_train_step, random_freeform_masks, save_inpaint)


@pytest.fixture(scope="module")
def tiny():
    net = InpaintNet(features=4, dilations=(2, 2))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (2, 3, 16, 16)).astype(np.float32))
    mask = jnp.asarray(random_freeform_masks(rng, 2, 16, 16))
    params = net.init(jax.random.PRNGKey(0), img, mask)
    return net, params, img, mask


def test_forward_shape_and_range(tiny):
    net, params, img, mask = tiny
    pred = net.apply(params, img, mask)
    assert pred.shape == img.shape
    assert float(pred.min()) >= 0.0 and float(pred.max()) <= 1.0


def test_compose_preserves_valid_region(tiny):
    net, params, img, mask = tiny
    out = compose(net.apply(params, img, mask), img, mask)
    valid = np.asarray(mask)[:, 0] == 0.0
    np.testing.assert_array_equal(
        np.asarray(out)[:, 0][valid], np.asarray(img)[:, 0][valid])


def test_training_reduces_loss(tiny):
    net, params, img, mask = tiny
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = make_train_step(net, tx)
    _, _, first = step(params, opt_state, img, mask)
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, img, mask)
    assert float(loss) < float(first)


def test_masks_are_binary_and_nonempty():
    rng = np.random.default_rng(1)
    m = random_freeform_masks(rng, 4, 32, 32)
    assert m.shape == (4, 1, 32, 32)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    assert all(m[b].sum() > 0 for b in range(4))


def test_inpaint_fn_plugs_into_bank(tiny):
    from t2onet_tpu.ops import bank

    net, params, img, mask = tiny
    fn = make_inpaint_fn(net, params, mask)
    # vocab id 7 = inpaint_obj -> executor op 4
    ids = jnp.full((img.shape[0],), 7, jnp.int32)
    out, chosen = bank.execute_bank(img, ids, jnp.zeros((img.shape[0], 24)),
                                    mask=mask, inpaint_fn=fn)
    assert out.shape == img.shape
    np.testing.assert_array_equal(np.asarray(chosen), 0.0)
    valid = np.asarray(mask)[:, 0] == 0.0
    np.testing.assert_allclose(
        np.asarray(out)[:, 0][valid], np.asarray(img)[:, 0][valid], atol=1e-6)
    # the hole must actually change (net output, not passthrough)
    hole = np.asarray(mask)[:, 0] == 1.0
    assert np.abs(np.asarray(out)[:, 0][hole]
                  - np.asarray(img)[:, 0][hole]).max() > 1e-4


def test_save_load_roundtrip(tiny, tmp_path):
    net, params, img, mask = tiny
    save_inpaint(str(tmp_path / "ck"), net, params)
    net2, params2 = load_inpaint(str(tmp_path / "ck"))
    np.testing.assert_allclose(
        np.asarray(net2.apply(params2, img, mask)),
        np.asarray(net.apply(params, img, mask)), atol=0)


def test_beam_search_selects_trained_inpaint_candidate(tiny):
    """Planner wiring (VERDICT r2 item 5): with inpaint_fn set, the
    inpaint candidate is evaluated directly (no parameter fit) and wins
    the beam when filling the hole is what the target wants."""
    from t2onet_tpu.planner.beam import beam_search

    rng = np.random.default_rng(3)
    img = rng.uniform(0.2, 0.8, (1, 3, 16, 16)).astype(np.float32)
    mask = np.zeros((1, 1, 16, 16), np.float32)
    mask[:, :, 4:12, 4:12] = 1.0

    # a perfect filler oracle: the planner contract is (B,3,H,W)->(B,3,H,W)
    # with mask semantics inside the closure — what the filler produces
    # is exactly what the target shows in the hole
    fill_value = np.float32(0.5)

    def perfect_fill(batch):
        m = jnp.asarray(mask)
        return jnp.asarray(batch) * (1 - m) + fill_value * m

    target = np.asarray(perfect_fill(img))
    actions, images = beam_search(
        img, target, beam_size=2, operations=(0, 4), max_step=2,
        err=1e-3, n_starts=1, n_iters=20,
        op_masks={4: mask[0]}, inpaint_fn=perfect_fill)
    best = actions[0]
    assert best[0][0] == "inpaint"
    assert best[0][2] < 1e-4                     # distance after the fill
    np.testing.assert_allclose(images[0][0], target, atol=1e-5)


def test_beam_search_inpaint_only_search(tiny):
    """operations=(4,) with inpaint_fn: no fit ops at all — the planner
    must still evaluate the direct inpaint candidate."""
    from t2onet_tpu.planner.beam import beam_search

    rng = np.random.default_rng(4)
    img = rng.uniform(0.2, 0.8, (1, 3, 16, 16)).astype(np.float32)
    mask = np.zeros((1, 1, 16, 16), np.float32)
    mask[:, :, 2:9, 3:10] = 1.0

    def fill(batch):
        m = jnp.asarray(mask)
        return jnp.asarray(batch) * (1 - m) + 0.25 * m

    target = np.asarray(fill(img))
    actions, _ = beam_search(img, target, beam_size=1, operations=(4,),
                             max_step=1, n_starts=1, n_iters=10,
                             inpaint_fn=fill)
    assert actions[0][0][0] == "inpaint"


def test_trained_filler_beats_copy_baseline():
    """A briefly-trained filler must reconstruct held-out holes better
    than the no-model baseline (hole left at the net input's zeros), and
    must differ from identity inside the mask — the 'demonstrably fills'
    bar (VERDICT r2 item 5)."""
    import optax

    rng = np.random.default_rng(7)
    net = InpaintNet(features=8, dilations=(2, 2))

    def batch(seed, n=8, s=32):
        r = np.random.default_rng(seed)
        # smooth ramps + low-frequency blobs: structure a filler can learn
        y, x = np.mgrid[0:s, 0:s].astype(np.float32) / (s - 1)
        imgs = []
        for _ in range(n):
            a, b, c = r.uniform(0.2, 0.8, 3)
            imgs.append(np.stack([a * x + (1 - a) * y,
                                  b * (1 - x) + (1 - b) * y,
                                  c * (x + y) / 2 + (1 - c) * 0.5], 0))
        return (np.clip(np.stack(imgs), 0, 1).astype(np.float32),
                random_freeform_masks(r, n, s, s))

    img, mask = batch(0)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(img),
                      jnp.asarray(mask))
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)
    step = make_train_step(net, tx)
    for it in range(120):
        bi, bm = batch(it + 1)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(bi), jnp.asarray(bm))

    ti, tm = batch(999)                          # held-out
    pred = np.asarray(compose(net.apply(params, jnp.asarray(ti),
                                        jnp.asarray(tm)),
                              jnp.asarray(ti), jnp.asarray(tm)))
    hole = np.asarray(tm) > 0.5
    hole3 = np.repeat(hole, 3, axis=1)
    model_err = np.abs(pred - ti)[hole3].mean()
    zero_fill_err = np.abs(0.0 - ti)[hole3].mean()   # net input baseline
    assert model_err < 0.5 * zero_fill_err, (model_err, zero_fill_err)
    assert np.abs(pred - ti)[hole3].max() > 1e-3     # not identity


def test_demo_program_mode_with_inpaint(tmp_path, tiny):
    """cli.demo --program executes an explicit op sequence with --mask +
    --inpaint_ckpt: the inpaint step must change the hole."""
    from PIL import Image

    from t2onet_tpu.cli.demo import main as demo_main

    net, params, _, _ = tiny
    ck = tmp_path / "ck"
    save_inpaint(str(ck), net, params)
    mask = np.zeros((16, 16), np.uint8)
    mask[4:12, 4:12] = 255
    mpath = tmp_path / "mask.png"
    Image.fromarray(mask).save(mpath)
    out = tmp_path / "demo"
    demo_main(["--synthetic", "--img_size", "16",
               "--out_dir", str(out), "--run_dir", str(tmp_path / "run"),
               "--program",
               '[["brightness", [0.2]], ["inpaint", []]]',
               "--mask", str(mpath), "--inpaint_ckpt", str(ck)])
    assert (out / "program.json").exists()
    step0 = np.asarray(Image.open(out / "step0.jpg"), np.float32)
    step1 = np.asarray(Image.open(out / "step1.jpg"), np.float32)
    assert np.abs(step1[4:12, 4:12] - step0[4:12, 4:12]).max() > 1.0
