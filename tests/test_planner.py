"""Planner tests: on-device param fitting recovers known edits; beam search
recovers known op sequences on synthetic pairs."""

import numpy as np
import jax.numpy as jnp

from t2onet_tpu.ops import operators as O
from t2onet_tpu.planner import fit as F
from t2onet_tpu.planner.beam import beam_search, init_distance


def _img(seed=0, size=24):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    img = np.stack([0.3 + 0.4 * x, 0.3 + 0.4 * y, 0.5 * (x + y)], 0)
    img += rng.uniform(-0.05, 0.05, img.shape).astype(np.float32)
    return np.clip(img, 0.05, 0.95)[None]


def test_fit_recovers_brightness_param():
    img = jnp.asarray(_img())
    target = O.apply_op_by_index(img, 0, jnp.asarray([[0.4]]))
    onehot = jnp.asarray(np.eye(9, dtype=np.float32)[[1]])     # brightness
    init = jnp.zeros((1, 24))
    params, dists = F.fit_op_params(img, target, onehot, init,
                                    n_iters=150, lr=0.05)
    assert float(dists[0, 0]) < 5e-3
    assert abs(float(params[0, 0, 0]) - 0.4) < 0.05


def test_fit_multiple_candidates_ranked():
    """Fit all 6 plan ops at once; the true op must win."""
    img = jnp.asarray(_img(1))
    target = O.apply_op_by_index(img, 2, jnp.asarray([[0.6]]))  # saturation
    slots = list(F.DEFAULT_PLAN_OPS)
    onehot = jnp.asarray(np.eye(9, dtype=np.float32)[
        F.candidate_op_slots(slots, 1) + 1])
    init = jnp.asarray(F.init_candidates(slots, 1))
    params, dists = F.fit_op_params(img, target, onehot, init,
                                    n_iters=150, lr=0.05)
    d = np.asarray(dists[0])
    assert slots[int(np.argmin(d))] == 2, d


def test_beam_search_recovers_single_op():
    img = _img(2)
    target = np.asarray(O.apply_op_by_index(jnp.asarray(img), 1,
                                            jnp.asarray([[0.5]])))  # contrast
    actions, images = beam_search(img, target, beam_size=2, max_step=3,
                                  err=1e-3, n_starts=1, n_iters=120, lr=0.05)
    top = actions[0]
    assert len(top) >= 1
    assert top[0][0] == "contrast"
    assert top[0][2] < 0.01                       # final dist tiny
    assert images[0][0].shape == img.shape


def test_beam_search_two_ops_improves():
    img = _img(3)
    t = O.apply_op_by_index(jnp.asarray(img), 0, jnp.asarray([[0.3]]))
    t = O.apply_op_by_index(t, 2, jnp.asarray([[0.5]]))
    target = np.asarray(t)
    actions, _ = beam_search(img, target, beam_size=3, max_step=4,
                             err=1e-3, n_starts=1, n_iters=100, lr=0.05)
    top = actions[0]
    names = [a[0] for a in top]
    assert len(names) == len(set(names))          # no repeats
    assert top[-1][2] < init_distance(img, target)
    assert top[-1][2] < 0.02


def test_beam_search_modes():
    img = _img(4)
    target = np.asarray(O.apply_op_by_index(jnp.asarray(img), 0,
                                            jnp.asarray([[0.4]])))
    a_fixed, _ = beam_search(img, target, operations=(0, 1), max_step=2,
                             mode="fixed", n_starts=1, n_iters=80)
    assert a_fixed[0][0][0] == "brightness"       # step 0 is op 0 by decree
    a_eps, _ = beam_search(img, target, beam_size=2, max_step=2, mode="eps",
                           eps=1.0, n_starts=1, n_iters=80, seed=3)
    assert len(a_eps) >= 1                        # random beams still valid


def test_init_candidates_reference_inits():
    init = F.init_candidates([0, 3, 5], n_starts=2)
    assert init.shape == (6, 24)
    np.testing.assert_array_equal(init[0], 0)             # brightness zeros
    np.testing.assert_array_equal(init[2, :24], 1)        # color ones
    np.testing.assert_array_equal(init[4, :8], 1)         # tone ones
    assert np.abs(init[1]).sum() > 0                      # jittered start


def test_beam_search_with_masks():
    """GIER-style local editing: masked planning recovers a local edit."""
    img = _img(6)
    mask = np.zeros((1, 1, 24, 24), np.float32)
    mask[:, :, :, :12] = 1.0
    bright = O.apply_op_by_index(jnp.asarray(img), 0, jnp.asarray([[0.6]]),
                                 mask=jnp.asarray(mask))
    target = np.asarray(bright)
    masked, _ = beam_search(img, target, beam_size=2, max_step=2, err=1e-3,
                            n_starts=1, n_iters=100,
                            op_masks={0: mask[0]})
    unmasked, _ = beam_search(img, target, beam_size=2, max_step=2, err=1e-3,
                              n_starts=1, n_iters=100)
    assert masked[0][-1][2] < 5e-3                  # near-exact with the mask
    assert masked[0][-1][2] <= unmasked[0][-1][2] + 1e-6


def test_batch_beam_search_matches_single():
    from t2onet_tpu.planner.beam import batch_beam_search

    ops_true = [0, 1, 2, 6]
    imgs, tgts = [], []
    for i, op in enumerate(ops_true):
        img = _img(10 + i)
        t = O.apply_op_by_index(jnp.asarray(img), op, jnp.asarray([[0.5]]))
        imgs.append(img[0])
        tgts.append(np.asarray(t)[0])
    I0 = np.stack(imgs)
    Igt = np.stack(tgts)
    results = batch_beam_search(I0, Igt, beam_size=2, max_step=2, err=1e-3,
                                n_starts=1, n_iters=100, lr=0.05)
    assert len(results) == 4
    for i, (actions, images) in enumerate(results):
        top = actions[0]
        assert top[0][0] == O.OP_NAMES[ops_true[i]], (i, top)
        assert top[0][2] < 0.01
        # matches the single-pair planner's first op + dist
        single, _ = beam_search(I0[i:i + 1], Igt[i:i + 1], beam_size=2,
                                max_step=2, err=1e-3, n_starts=1,
                                n_iters=100, lr=0.05)
        assert single[0][0][0] == top[0][0]
        assert abs(single[0][0][2] - top[0][2]) < 1e-4


def test_fit_l2_dist_recovers_param():
    """dist='l2' (reference beam_search.py:174's evident intent) recovers
    the same edit; returned dists are squared-scale."""
    img = jnp.asarray(_img(7))
    target = O.apply_op_by_index(img, 0, jnp.asarray([[0.4]]))
    onehot = jnp.asarray(np.eye(9, dtype=np.float32)[[1]])
    init = jnp.zeros((1, 24))
    params, dists = F.fit_op_params(img, target, onehot, init,
                                    n_iters=150, lr=0.05, dist="l2")
    assert abs(float(params[0, 0, 0]) - 0.4) < 0.05
    assert float(dists[0, 0]) < 1e-4                # MSE of a near-exact fit


def test_normalize_dist_type_reference_spellings():
    import pytest

    from t2onet_tpu.planner.beam import normalize_dist_type

    assert normalize_dist_type("L1") == "l1"
    assert normalize_dist_type("L2") == "l2"
    with pytest.raises(ValueError):
        normalize_dist_type("perceptual")           # stub in the reference


def _l1_score_fn(outs, aux):
    """score_fn expressing plain L1-to-target through the scored-fit path —
    must reproduce fit_op_params exactly."""
    (target,) = aux
    return jnp.abs(outs - target[:, None]).mean(axis=(2, 3, 4))


def test_scored_fit_matches_l1_fit():
    img = jnp.asarray(_img(8))
    target = O.apply_op_by_index(img, 2, jnp.asarray([[0.5]]))
    slots = list(F.DEFAULT_PLAN_OPS)
    onehot = jnp.asarray(np.eye(9, dtype=np.float32)[
        F.candidate_op_slots(slots, 1) + 1])
    init = jnp.asarray(F.init_candidates(slots, 1))
    p1, d1 = F.fit_op_params(img, target, onehot, init, n_iters=80, lr=0.05)
    p2, d2 = F.fit_op_params_scored(img, onehot, init, _l1_score_fn,
                                    (target,), n_iters=80, lr=0.05)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)


def test_beam_search_score_fn_matches_plain():
    img = _img(9)
    target = np.asarray(O.apply_op_by_index(jnp.asarray(img), 1,
                                            jnp.asarray([[0.5]])))
    plain, _ = beam_search(img, target, beam_size=2, max_step=2, err=1e-3,
                           n_starts=1, n_iters=100, lr=0.05)
    scored, _ = beam_search(img, target, beam_size=2, max_step=2, err=1e-3,
                            n_starts=1, n_iters=100, lr=0.05,
                            score_fn=_l1_score_fn,
                            score_aux=(jnp.asarray(target),))
    assert plain[0][0][0] == scored[0][0][0]
    assert abs(plain[0][0][2] - scored[0][0][2]) < 1e-5


def test_beam_search_disc_distance():
    """seq2seqGAN-disc mode: a (random-init) text-conditioned multiscale
    discriminator scores candidates; the planner must run end-to-end and
    produce in-range scores and valid op programs."""
    import jax

    from t2onet_tpu.models.gan import (MultiscaleDiscriminator,
                                       make_disc_planner_score)

    img = _img(11, size=16)
    disc = MultiscaleDiscriminator(ndf=4, n_layers=2, num_D=2)
    v = disc.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 16, 16)),
                  jnp.zeros((1, 512)))

    def disc_apply(x6, cond):
        out, _ = disc.apply(v, x6, cond, train=True,
                            mutable=["batch_stats"])
        return out

    score_fn = make_disc_planner_score(disc_apply)
    cond = jnp.zeros((1, 512))
    actions, images = beam_search(
        img, img, beam_size=2, max_step=2, err=-1.0, n_starts=1,
        n_iters=30, lr=0.05, score_fn=score_fn,
        score_aux=(jnp.asarray(img), cond))
    top = actions[0]
    assert len(top) >= 1
    assert all(a[0] in O.OP_NAMES for a in top)
    assert all(0.0 <= a[2] <= 1.0 for a in top)     # 1 - sigmoid in [0,1]
    assert images[0][0].shape == img.shape


def test_batch_beam_search_sharded_matches_unsharded():
    """Lockstep planning with the pair axis sharded over the virtual
    8-device mesh must produce the same plans (computation-follows-data
    SPMD; candidates are independent across pairs)."""
    from t2onet_tpu.parallel.mesh import make_mesh
    from t2onet_tpu.planner.beam import batch_beam_search

    ops_true = [0, 1, 2, 6]
    imgs, tgts = [], []
    for i, op in enumerate(ops_true):
        img = _img(20 + i, size=16)
        t = O.apply_op_by_index(jnp.asarray(img), op, jnp.asarray([[0.5]]))
        imgs.append(img[0])
        tgts.append(np.asarray(t)[0])
    I0, Igt = np.stack(imgs), np.stack(tgts)
    kw = dict(beam_size=2, max_step=2, err=1e-3, n_starts=1, n_iters=60,
              lr=0.05)
    plain = batch_beam_search(I0, Igt, **kw)
    sharded = batch_beam_search(I0, Igt, mesh=make_mesh(n_devices=8), **kw)
    for (a1, _), (a2, _) in zip(plain, sharded):
        assert a1[0][0][0] == a2[0][0][0]
        np.testing.assert_allclose(a1[0][0][2], a2[0][0][2], atol=1e-5)
        np.testing.assert_allclose(np.asarray(a1[0][0][1]),
                                   np.asarray(a2[0][0][1]), atol=1e-4)


def test_batch_beam_search_with_per_pair_masks():
    """Lockstep masked planning (GIER batched): per-pair masks condition
    each pair's fit; results match the single-pair masked planner."""
    from t2onet_tpu.planner.beam import batch_beam_search

    imgs, tgts, masks = [], [], []
    for i in range(2):
        img = _img(30 + i, size=16)
        m = np.zeros((1, 1, 16, 16), np.float32)
        if i == 0:
            m[:, :, :, :8] = 1.0           # left-half edit
        else:
            m[:, :, :8, :] = 1.0           # top-half edit
        t = O.apply_op_by_index(jnp.asarray(img), 0, jnp.asarray([[0.6]]),
                                mask=jnp.asarray(m))
        imgs.append(img[0])
        tgts.append(np.asarray(t)[0])
        masks.append({0: m[0]})
    I0, Igt = np.stack(imgs), np.stack(tgts)
    kw = dict(beam_size=2, max_step=2, err=1e-3, n_starts=1, n_iters=80,
              lr=0.05, seed=0)
    results = batch_beam_search(I0, Igt, op_masks=masks, **kw)
    for i, (actions, images) in enumerate(results):
        single, _ = beam_search(I0[i:i + 1], Igt[i:i + 1],
                                op_masks=masks[i], **kw)
        assert actions[0][0][0] == single[0][0][0] == "brightness"
        assert actions[0][0][2] < 5e-3          # mask makes it near-exact
        np.testing.assert_allclose(actions[0][0][2], single[0][0][2],
                                   atol=1e-4)
        # replay respects the mask: unedited region identical to input
        out0 = np.asarray(images[0][0])[0]
        inv = 1.0 - masks[i][0][0]
        np.testing.assert_allclose(out0 * inv, I0[i] * inv, atol=1e-6)
