"""Loss unit tests (SURVEY.md §4.3): torch-golden SSIM, the LCC invariance
test, automask behavior on static scenes, end-to-end loss gradients."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from colvo.config import LossConfig, ModelConfig
from colvo.losses import (
    ssim,
    photometric_error,
    lcc_calibrate,
    smoothness_loss,
    geometry_consistency,
    automask,
    snippet_loss,
)

RNG = np.random.default_rng(3)


def rand_img(b=2, h=32, w=40, c=3):
    return jnp.asarray(RNG.random((b, h, w, c)).astype(np.float32))


# ---------------------------------------------------------------- SSIM


def test_ssim_self_is_one():
    x = rand_img()
    s = ssim(x, x)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-4)


def test_ssim_matches_torch_golden_interior():
    """Monodepth2-style torch SSIM (3×3 avg pools) on interior pixels."""
    import torch
    import torch.nn.functional as F

    x = RNG.random((2, 24, 28, 3)).astype(np.float32)
    y = np.clip(x + 0.1 * RNG.normal(size=x.shape).astype(np.float32), 0, 1)

    ours = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    ty = torch.from_numpy(y).permute(0, 3, 1, 2)
    # family SSIM: reflect pad 1 + 3x3 avg pool
    pad = torch.nn.ReflectionPad2d(1)
    pool = lambda t: F.avg_pool2d(pad(t), 3, 1)
    mu_x, mu_y = pool(tx), pool(ty)
    sx = pool(tx * tx) - mu_x**2
    sy = pool(ty * ty) - mu_y**2
    sxy = pool(tx * ty) - mu_x * mu_y
    c1, c2 = 0.01**2, 0.03**2
    ref = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (sx + sy + c2)
    )
    ref = ref.permute(0, 2, 3, 1).numpy()
    # padding differs (reflect vs normalized-same) → compare interior
    np.testing.assert_allclose(ours[:, 1:-1, 1:-1], ref[:, 1:-1, 1:-1], atol=1e-4)


def test_photometric_zero_for_identical():
    x = rand_img()
    e = photometric_error(x, x)
    np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-5)


# ---------------------------------------------------------------- LCC


def test_lcc_invariance_to_brightness_ramp():
    """THE behavioral test for README.md:7 (SURVEY.md §4.3): a synthetic
    brightness/contrast ramp on the source must leave the LCC-calibrated
    photometric loss ≈ unchanged."""
    tgt = rand_img(1, 48, 64)
    # smooth spatial gain ramp (moving light source) + offset
    xs = np.linspace(0.7, 1.4, 64, dtype=np.float32)[None, None, :, None]
    corrupted = jnp.clip(tgt * xs + 0.05, 0.0, 1.5)

    base = float(jnp.mean(photometric_error(lcc_calibrate(tgt, tgt), tgt)))
    cal = float(jnp.mean(photometric_error(lcc_calibrate(corrupted, tgt), tgt)))
    raw = float(jnp.mean(photometric_error(corrupted, tgt)))
    assert raw > 5 * max(cal, 1e-6), (raw, cal)
    assert cal < base + 5e-3


def test_lcc_does_not_fix_geometry():
    """LCC must correct illumination, not hide misalignment: a spatially
    shifted source should still score a large error after calibration."""
    tgt = rand_img(1, 48, 64)
    shifted = jnp.roll(tgt, 7, axis=2)
    cal_err = float(jnp.mean(photometric_error(lcc_calibrate(shifted, tgt), tgt)))
    aligned_err = float(jnp.mean(photometric_error(tgt, tgt)))
    assert cal_err > 10 * (aligned_err + 1e-4)


def test_lcc_gain_mode():
    tgt = rand_img(1, 32, 32)
    bright = tgt * 1.3
    cal = lcc_calibrate(bright, tgt, mode="gain")
    assert float(jnp.mean(jnp.abs(cal - tgt))) < float(jnp.mean(jnp.abs(bright - tgt)))


def test_lcc_global_mode_exact_on_exposure():
    """Per-frame auto-exposure (one global affine per frame) is removed
    EXACTLY by the global mode — including on low-texture frames where
    the 15 px windowed estimate is variance-starved noise (VERDICT r2
    next #5)."""
    # nearly-flat frame: local variance ~1e-4, global structure only
    yy = np.linspace(0.4, 0.6, 48, dtype=np.float32)[None, :, None, None]
    tgt = jnp.asarray(
        yy + 0.01 * RNG.random((1, 48, 64, 3)).astype(np.float32)
    )
    exposed = jnp.clip(tgt * 1.9 + 0.03, 0.0, 2.0)  # within global clip

    raw = float(jnp.mean(photometric_error(exposed, tgt)))
    cal = float(
        jnp.mean(photometric_error(lcc_calibrate(exposed, tgt, "global"), tgt))
    )
    assert abs(cal) < 1e-5, cal  # exact removal
    # composite modes: the windowed second stage re-adds a little
    # variance-starved-window noise on low-texture frames, but the
    # exposure itself must stay >100x absorbed
    for mode in ["global+affine", "global+gain"]:
        cal = float(
            jnp.mean(photometric_error(lcc_calibrate(exposed, tgt, mode), tgt))
        )
        assert cal < 1e-3 and raw > 100 * cal, (mode, raw, cal)


def test_lcc_global_masked_moments_ignore_invalid_region():
    """Out-of-frame samples (border-clamped by the sampler) must not bias
    the global gain: with a validity mask excluding a corrupted band, the
    calibration is exact on the valid region (ADVICE r3)."""
    yy = np.linspace(0.3, 0.7, 48, dtype=np.float32)[None, :, None, None]
    tgt = jnp.asarray(yy + 0.01 * RNG.random((1, 48, 64, 3)).astype(np.float32))
    exposed = jnp.clip(tgt * 1.6 + 0.02, 0.0, 2.0)
    # corrupt the bottom quarter the way border-clamping does (constant
    # replication of one row — wrong content, plausible values)
    corrupted = exposed.at[:, 36:].set(exposed[:, 35:36])
    mask = jnp.ones((1, 48, 64)).at[:, 36:].set(0.0)

    cal_masked = lcc_calibrate(corrupted, tgt, "global", valid_mask=mask)
    err_valid = float(jnp.mean(jnp.abs(cal_masked - tgt)[:, :36]))
    assert err_valid < 1e-5, err_valid  # exact on the valid region

    # unmasked, the corrupted band biases ga/gb and the valid region pays
    cal_unmasked = lcc_calibrate(corrupted, tgt, "global")
    err_unmasked = float(jnp.mean(jnp.abs(cal_unmasked - tgt)[:, :36]))
    assert err_unmasked > 10 * max(err_valid, 1e-7), (err_unmasked, err_valid)


def test_lcc_global_does_not_fix_geometry():
    """One scalar gain per frame cannot absorb spatial misalignment."""
    tgt = rand_img(1, 48, 64)
    shifted = jnp.roll(tgt, 7, axis=2)
    for mode in ["global", "global+affine"]:
        cal_err = float(
            jnp.mean(photometric_error(lcc_calibrate(shifted, tgt, mode), tgt))
        )
        assert cal_err > 10 * 1e-4, (mode, cal_err)


def test_lcc_global_coeffs_are_stop_gradiented():
    tgt = rand_img(1, 16, 16)

    def f(src):
        return jnp.sum(
            photometric_error(lcc_calibrate(src, tgt, "global+affine"), tgt)
        )

    g = jax.grad(f)(tgt * 1.2)
    assert np.all(np.isfinite(np.asarray(g)))


def test_lcc_coeffs_are_stop_gradiented():
    tgt = rand_img(1, 16, 16)

    def f(src):
        return jnp.sum(photometric_error(lcc_calibrate(src, tgt), tgt))

    g = jax.grad(f)(tgt * 1.2)
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------- terms


def test_smoothness_prefers_smooth_disp():
    img = jnp.ones((1, 32, 32, 3)) * 0.5
    smooth_disp = jnp.ones((1, 32, 32, 1)) * 0.5
    noisy_disp = jnp.asarray(RNG.random((1, 32, 32, 1)).astype(np.float32))
    assert float(smoothness_loss(smooth_disp, img)) < float(smoothness_loss(noisy_disp, img))


def test_geometry_consistency_identity():
    d = jnp.asarray(1.0 + RNG.random((1, 16, 16)).astype(np.float32))
    loss, w = geometry_consistency(d, d, jnp.ones_like(d))
    assert float(loss) < 1e-6
    np.testing.assert_allclose(np.asarray(w), 1.0, atol=1e-5)


def test_geometry_consistency_behind_camera_is_not_free():
    """Behind-camera (z≤0) pixels must score maximal inconsistency, not
    drop out of the mask: the masked mean has a degenerate minimum at
    "everything invalid" which the uncapped geo gradient actually finds
    (depth→min, translation→large, every z<0 → loss cliff-drops to 0).
    The fix makes the loss continuous (→1) as pixels go behind."""
    d = jnp.asarray(1.0 + RNG.random((1, 16, 16)).astype(np.float32))
    valid = jnp.ones_like(d)
    # all behind: loss = 1 + |z|/s = 2 here (above the in-front ceiling
    # of 1), NOT 0
    loss_all, w_all = geometry_consistency(
        -d, d, valid, behind=jnp.ones_like(d, bool)
    )
    np.testing.assert_allclose(float(loss_all), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_all), 0.0, atol=1e-6)
    # all behind AND all out of frame (valid=0) — the actual escape state
    # observed in training — must still cost ≥1, not cliff to 0
    loss_oob, _ = geometry_consistency(
        -d, d, jnp.zeros_like(d), behind=jnp.ones_like(d, bool)
    )
    np.testing.assert_allclose(float(loss_oob), 2.0, atol=1e-5)
    # half behind: loss above the healthy half's mean diff; finite grads;
    # and the behind half has a RESTORING gradient (dL/dz < 0: pushing z
    # forward, back in front of the camera, lowers the loss)
    behind = jnp.concatenate(
        [jnp.ones((1, 8, 16), bool), jnp.zeros((1, 8, 16), bool)], axis=1
    )
    z = jnp.where(behind, -d, d * 1.1)

    def f(zz):
        loss, _ = geometry_consistency(zz, d, valid, behind=behind)
        return loss

    loss_half = float(f(z))
    assert 0.5 < loss_half < 2.0
    g = np.asarray(jax.grad(f)(z))
    assert np.all(np.isfinite(g))
    assert np.abs(g[0, 8:]).max() > 0  # healthy half still drives depth
    assert g[0, :8].max() < 0  # restoring force, not a plateau


def test_geometry_consistency_rare_behind_has_no_drift_pressure():
    """A few transient behind pixels (frame borders, every healthy run)
    must cost a CONSTANT penalty with ZERO gradient: the always-on
    restoring slope was a chronic one-way force along the monocular
    scale-flat direction and drifted the trajectory scale ~80× over 4k
    steps (runs/ablate r2 cell dcdp1_lcc1, polyp e 0.2 → 8). The slope
    gates on per-image behind fraction > 5 %."""
    d = jnp.asarray(1.0 + RNG.random((1, 16, 16)).astype(np.float32))
    valid = jnp.ones_like(d)
    behind = jnp.zeros((1, 16, 16), bool).at[0, 0, :4].set(True)  # ~1.6 %
    z = jnp.where(behind, -d, d)

    def f(zz):
        loss, _ = geometry_consistency(zz, d, valid, behind=behind)
        return loss

    g = np.asarray(jax.grad(f)(z))
    assert np.all(g[np.asarray(behind)] == 0.0)  # no drift pressure
    # ...but the pixels still COST (diff = 1 each), so going behind is
    # never a free lunch for the optimizer
    np.testing.assert_allclose(float(f(z)), 4.0 / 256.0, atol=1e-5)
    # and the epidemic (>5 %) still activates the restoring slope
    behind_many = jnp.zeros((1, 16, 16), bool).at[0, :3, :].set(True)  # ~19 %
    z_many = jnp.where(behind_many, -d, d)

    def f_many(zz):
        loss, _ = geometry_consistency(zz, d, valid, behind=behind_many)
        return loss

    g_many = np.asarray(jax.grad(f_many)(z_many))
    assert g_many[np.asarray(behind_many)].max() < 0  # restoring force


def test_automask_static_scene():
    """Static scene (source == target): identity error is 0, warped error
    positive → all pixels masked out (SURVEY.md §4.3)."""
    warped_err = jnp.full((1, 8, 8, 2), 0.3)
    ident_err = jnp.zeros((1, 8, 8, 2))
    _, mask = automask(warped_err, ident_err)
    np.testing.assert_allclose(np.asarray(mask), 0.0)

    # moving scene: warped better than identity → kept
    _, mask2 = automask(ident_err, warped_err)
    np.testing.assert_allclose(np.asarray(mask2), 1.0)


# ---------------------------------------------------------------- total


import functools


@functools.lru_cache(maxsize=None)  # 8 call sites, 2 distinct signatures —
def _setup_snippet(h=32, w=32, b=1, n_scales=4):  # share the model init
    from colvo.models import ColVOModel

    mcfg = ModelConfig(dtype="float32", n_scales=n_scales)
    model = ColVOModel(mcfg)
    frames = jnp.asarray(RNG.random((b, 3, h, w, 3)).astype(np.float32))
    # jit the init: eager per-op dispatch of the conv net's init costs
    # ~7x a cold compile+run of the same graph on CPU (measured 15.1 s
    # eager vs 2.0 s jitted at 32x32) — the single biggest fast-loop tax.
    params = jax.jit(model.init)(jax.random.key(0), frames)
    k = jnp.array([[0.58 * w, 0, w / 2], [0, 0.92 * h, h / 2], [0, 0, 1]], dtype=jnp.float32)
    return model, params, frames, k, mcfg


def _rand_disps_poses(mcfg, frames):
    """Random-but-plausible decoder outputs: per-frame disparity pyramids
    (sigmoid range, scale s at H/2^s) + small pose params. Lets loss
    tests differentiate w.r.t. the loss INPUTS without compiling the
    conv model into the graph."""
    b, n_frames, h, w = frames.shape[:4]
    disps = [
        [
            jnp.asarray(
                0.05 + 0.9 * RNG.random(
                    (b, h >> s, w >> s, 1)
                ).astype(np.float32)
            )
            for s in range(mcfg.n_scales)
        ]
        for _ in range(n_frames)
    ]
    poses = jnp.asarray(
        0.01 * RNG.standard_normal((b, n_frames - 1, 6)).astype(np.float32)
    )
    return disps, poses


@pytest.mark.slow
def test_snippet_loss_finite_and_grads_flow():
    model, params, frames, k, mcfg = _setup_snippet()
    lcfg = LossConfig()

    def loss_fn(p):
        disps, poses = model.apply(p, frames)
        loss, aux = snippet_loss(
            disps, poses, frames, k, jnp.linalg.inv(k), lcfg, mcfg
        )
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    for name in ["loss/photometric", "loss/smoothness", "loss/geometric"]:
        assert np.isfinite(float(aux[name])), name
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert sum(float(jnp.sum(jnp.abs(g))) for g in leaves) > 0
    assert aux["depth/full"].shape == frames.shape[:1] + frames.shape[2:4]


def test_snippet_loss_ablations_run():
    # fast loop: one representative per knob family — everything-off,
    # the production default (covered by other fast tests implicitly but
    # cheap here), and the family full-res geo contract. The remaining
    # mixed modes run in the slow sibling (fast-loop budget, VERDICT r4
    # next #8).
    model, params, frames, k, mcfg = _setup_snippet(32, 32, n_scales=2)
    disps, poses = jax.jit(model.apply)(params, frames)
    for lcfg in [
        LossConfig(lcc=False, geometric_weight=0.0, automask=False),
        LossConfig(geo_full_res=True, geo_stopgrad=False),
        LossConfig(geo_full_res=False, geo_stopgrad=False),
    ]:
        # jitted: eager per-op dispatch of the loss graph costs 2-4x its
        # cold compile+run on CPU (fast-loop budget)
        loss = jax.jit(
            lambda d, p, cfg=lcfg: snippet_loss(
                d, p, frames, k, jnp.linalg.inv(k), cfg, mcfg)[0]
        )(disps, poses)
        assert np.isfinite(float(loss))


@pytest.mark.slow
def test_snippet_loss_ablations_run_mixed_modes():
    model, params, frames, k, mcfg = _setup_snippet(32, 32, n_scales=2)
    disps, poses = model.apply(params, frames)
    for lcfg in [
        LossConfig(lcc_mode="gain"),
        LossConfig(automask=False, min_reprojection=True),
        LossConfig(automask=False, min_reprojection=False),
        LossConfig(geo_full_res=True, geo_stopgrad=True),
    ]:
        loss, _ = snippet_loss(disps, poses, frames, k, jnp.linalg.inv(k), lcfg, mcfg)
        assert np.isfinite(float(loss))


def test_geo_modes_grads_flow_and_agree_on_sign():
    """Both geo protocols produce finite, nonzero grads; the stop-grad mode
    must still backprop into pose and target depth (only the sampled source
    depth is detached). Differentiates w.r.t. (disps, poses) DIRECTLY —
    the contract is a property of the loss, and leaving the conv model
    out of the graph cuts the CPU compile ~10x (fast-loop budget,
    VERDICT r2 next #9); grads THROUGH the model are covered by the
    slow-marked test_snippet_loss_finite_and_grads_flow."""
    _, _, frames, k, mcfg = _setup_snippet(n_scales=2)
    disps, poses = _rand_disps_poses(mcfg, frames)

    def loss_fn(dp):
        loss, aux = snippet_loss(
            dp[0], dp[1], frames, k, jnp.linalg.inv(k), LossConfig(), mcfg
        )
        return loss, aux["loss/geometric"]

    (loss, geo), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )((disps, poses))
    assert np.isfinite(float(loss)) and np.isfinite(float(geo))
    assert float(geo) > 0
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # pose AND every frame's disparity pyramid receive gradient
    assert float(jnp.sum(jnp.abs(grads[1]))) > 0
    for fi, pyr in enumerate(grads[0]):
        assert sum(float(jnp.sum(jnp.abs(g))) for g in pyr) > 0, fi


@pytest.mark.slow
def test_geo_full_res_grads_flow():
    """Grad flow through the family's full-res/full-grad geo protocol
    (the semantics contract; fwd covered fast in ablations_run)."""
    model, params, frames, k, mcfg = _setup_snippet(n_scales=2)

    def loss_fn(p):
        disps, poses = model.apply(p, frames)
        loss, aux = snippet_loss(
            disps, poses, frames, k, jnp.linalg.inv(k),
            LossConfig(geo_full_res=True, geo_stopgrad=False), mcfg,
        )
        return loss, aux["loss/geometric"]

    (loss, geo), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss)) and float(geo) > 0
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert sum(float(jnp.sum(jnp.abs(g))) for g in leaves) > 0


def _check_batched_photo(extras):
    """loss.batched_photo groups the n_scales x n_sources photometric
    evaluations into one sampler call + one vmapped stats pipeline; it
    must be the per-pair loop's math exactly (same loss AND same grads).
    Grads are taken w.r.t. (disps, poses) — the loss inputs — which pins
    the same VJP equivalence while keeping the conv model out of the
    compiled graphs (fast-loop budget); see _rand_disps_poses."""
    _, _, frames, k, mcfg = _setup_snippet(n_scales=2)
    disps, poses = _rand_disps_poses(mcfg, frames)

    def loss_fn(dp, lcfg):
        loss, _ = snippet_loss(
            dp[0], dp[1], frames, k, jnp.linalg.inv(k), lcfg, mcfg
        )
        return loss

    for extra in extras:
        # eager on purpose: jitting these four VJP programs costs more in
        # CPU compiles than eager dispatch saves (measured)
        l_b, g_b = jax.value_and_grad(
            lambda dp: loss_fn(dp, LossConfig(batched_photo=True, **extra))
        )((disps, poses))
        l_l, g_l = jax.value_and_grad(
            lambda dp: loss_fn(dp, LossConfig(batched_photo=False, **extra))
        )((disps, poses))
        np.testing.assert_allclose(float(l_b), float(l_l), rtol=1e-6)
        for a, b_ in zip(jax.tree.leaves(g_b), jax.tree.leaves(g_l)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-5, atol=1e-7
            )


def test_batched_photo_equals_per_pair_loop():
    # fast loop: the two production configs — default windowed LCC and the
    # global-mode path (per-plane valid masks through the vmapped stats)
    _check_batched_photo([{}, {"lcc_mode": "global+affine"}])


@pytest.mark.slow
def test_batched_photo_equals_per_pair_loop_toggles():
    # rarer toggles (fast-loop budget, VERDICT r4 next #8)
    _check_batched_photo([{"lcc": False}, {"automask": False}])


@pytest.mark.slow
def test_photo_remat_is_exact():
    """loss.photo_remat wraps the LCC/SSIM stats pipeline in
    jax.checkpoint — a pure rematerialization that must not change the
    loss value or any parameter gradient (only the HBM residuals saved
    for the VJP)."""
    model, params, frames, k, mcfg = _setup_snippet()

    def loss_fn(p, lcfg):
        disps, poses = model.apply(p, frames)
        loss, _ = snippet_loss(
            disps, poses, frames, k, jnp.linalg.inv(k), lcfg, mcfg
        )
        return loss

    l_r, g_r = jax.value_and_grad(
        lambda p: loss_fn(p, LossConfig(photo_remat=True))
    )(params)
    l_d, g_d = jax.value_and_grad(lambda p: loss_fn(p, LossConfig()))(params)
    np.testing.assert_allclose(float(l_r), float(l_d), rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_d)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-5, atol=1e-7
        )


@pytest.mark.slow
def test_photo_native_finite_and_grads_flow():
    """The scale-native photometric protocol (SfMLearner-style: pyramid
    frames, scale-local projection) — a different objective from the
    full-res default, so the contract is finiteness + full grad flow,
    not equivalence. Covers the geo-consistency projection-reuse branch
    (geo_res_cap=0 default) and the composed photo_native+photo_remat
    byte-diet config."""
    model, params, frames, k, mcfg = _setup_snippet()

    def loss_fn(p, lcfg):
        disps, poses = model.apply(p, frames)
        loss, aux = snippet_loss(
            disps, poses, frames, k, jnp.linalg.inv(k), lcfg, mcfg
        )
        return loss, aux

    for lcfg in [
        LossConfig(photo_native=True),
        LossConfig(photo_native=True, photo_remat=True),
        LossConfig(photo_native=True, geo_res_cap=64),  # recompute branch
        LossConfig(photo_native=True, automask=False),
    ]:
        (loss, aux), grads = jax.value_and_grad(
            lambda p: loss_fn(p, lcfg), has_aux=True
        )(params)
        assert np.isfinite(float(loss)) and float(loss) > 0
        assert np.isfinite(float(aux["loss/geometric"]))
        assert float(aux["loss/geometric"]) > 0
        leaves = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        assert sum(float(jnp.sum(jnp.abs(g))) for g in leaves) > 0


def test_photo_native_config_conflicts_raise():
    # conflicts raise at trace time — random loss inputs suffice, no need
    # to run the conv model (fast-loop budget)
    _, _, frames, k, mcfg = _setup_snippet()
    disps, poses = _rand_disps_poses(mcfg, frames)
    for lcfg in [
        LossConfig(photo_native=True, geo_full_res=True),
        LossConfig(photo_native=True, batched_photo=True),
    ]:
        with pytest.raises(ValueError):
            snippet_loss(disps, poses, frames, k, jnp.linalg.inv(k), lcfg, mcfg)


@pytest.mark.slow  # two extra snippet-loss grad compiles (~70 s on CPU);
# the knob is off by default and the cheap rejection test below stays fast
def test_compute_dtype_close_to_f32_and_grads_flow():
    """loss.compute_dtype casts the photometric planes downstream of the
    f32 gather (byte diet for the bandwidth-bound step); the loss must
    stay a small perturbation of the f32 protocol with finite, nonzero,
    directionally-consistent gradients. Differentiates w.r.t. the loss
    INPUTS (fast-loop budget — no conv model in the graph)."""
    _, _, frames, k, mcfg = _setup_snippet(32, 32, n_scales=2)
    disps, poses = _rand_disps_poses(mcfg, frames)
    k_inv = jnp.linalg.inv(k)

    def loss_of(lcfg):
        def f(d, p):
            loss, _ = snippet_loss(d, p, frames, k, k_inv, lcfg, mcfg)
            return loss

        return jax.value_and_grad(f, argnums=(0, 1))(disps, poses)

    ref, ref_g = loss_of(LossConfig(lcc_mode="global+affine"))
    # float16 is NOT in the matrix: it produces NaN gradients through the
    # SSIM backward (measured — see config.py loss.compute_dtype note)
    # and snippet_loss rejects it (test below).
    for dtype, tol in [("bfloat16", 0.05)]:
        val, g = loss_of(
            LossConfig(lcc_mode="global+affine", compute_dtype=dtype)
        )
        rel = abs(float(val) - float(ref)) / abs(float(ref))
        assert rel < tol, (dtype, float(val), float(ref))
        leaves = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
        assert sum(float(jnp.sum(jnp.abs(x))) for x in leaves) > 0
        # pose gradient direction survives the quantization
        cos = float(
            jnp.sum(g[1] * ref_g[1])
            / (jnp.linalg.norm(g[1]) * jnp.linalg.norm(ref_g[1]) + 1e-12)
        )
        assert cos > 0.97, (dtype, cos)  # measured 0.978 on this fixture


def test_compute_dtype_invalid_raises():
    # rejections fire at trace time — random loss inputs, no conv model
    _, _, frames, k, mcfg = _setup_snippet(32, 32, n_scales=2)
    disps, poses = _rand_disps_poses(mcfg, frames)
    with pytest.raises(ValueError):
        snippet_loss(
            disps, poses, frames, k, jnp.linalg.inv(k),
            LossConfig(compute_dtype="half"), mcfg,
        )
    with pytest.raises(ValueError):
        snippet_loss(
            disps, poses, frames, k, jnp.linalg.inv(k),
            LossConfig(compute_dtype="float16"), mcfg,
        )
    # fused_kernel + compute_dtype is a half-applied combination (the K1
    # planes are f32 in VMEM) — must be rejected, not silently mixed
    # (ADVICE r4).
    with pytest.raises(ValueError, match="fused_kernel"):
        snippet_loss(
            disps, poses, frames, k, jnp.linalg.inv(k),
            LossConfig(fused_kernel=True, compute_dtype="bfloat16"), mcfg,
        )


@pytest.mark.slow  # non-default knob pending its training cell
def test_lcc_identity_restores_automask_under_jitter():
    """loss.lcc_identity: on a STATIC scene whose source frames differ only
    by a per-frame exposure gain, the raw identity error carries the gain
    mismatch, so the automask keeps the (ambiguous) pixels; calibrating
    the identity reference the same way as the warped source restores the
    static-scene masking (photometric term collapses toward 0)."""
    _, _, frames, k, mcfg = _setup_snippet(32, 32, n_scales=2)
    disps, poses = _rand_disps_poses(mcfg, frames)
    # STATIC scene, exposure-gained sources, and a deliberately WRONG
    # warp (large pose): the warped error is genuinely bad, the identity
    # explanation is genuinely right (up to gain). A fair automask must
    # mask these pixels out (identity wins) — which requires the identity
    # error to see the same calibration the warped error gets.
    poses = poses * 0.0
    poses = poses.at[..., 3].set(0.08)  # a mildly wrong ~2 px warp
    yy, xx = np.mgrid[0:32, 0:32]
    base = (0.25 + 0.2 * np.sin(xx / 4.0) + 0.2 * np.cos(yy / 5.0)
            + 0.1 * np.sin((xx + yy) / 7.0)).astype(np.float32)
    base = np.broadcast_to(base[None, None, :, :, None],
                           (1, 1, 32, 32, 3)).copy()
    jit = np.concatenate([base, base * 0.75, base * 0.8], axis=1)
    jit = jnp.asarray(np.clip(jit, 0.0, 1.0).astype(np.float32))

    def photo(lcc_identity):
        lcfg = LossConfig(lcc_mode="global+affine", geometric_weight=0.0,
                          lcc_identity=lcc_identity)
        _, aux = snippet_loss(disps, poses, jit, k, jnp.linalg.inv(k),
                              lcfg, mcfg)
        return float(aux["loss/photometric"])

    raw, calibrated = photo(False), photo(True)
    # raw: the gain mismatch inflates the identity error, the automask
    # keeps the bad warped pixels, photometric stays large; calibrated:
    # the identity explanation ≈ exact, (nearly) everything masks out
    assert calibrated < 0.3 * raw, (raw, calibrated)


def test_geo_scale_ramps_term_weight_only():
    """snippet_loss(geo_scale=s): total moves by exactly (1-s)·w_geo·geo;
    the aux geo metric stays UNSCALED (comparable across the ramp)."""
    _, _, frames, k, mcfg = _setup_snippet(32, 32, n_scales=2)
    disps, poses = _rand_disps_poses(mcfg, frames)
    lcfg = LossConfig()
    t1, a1_ = snippet_loss(disps, poses, frames, k, jnp.linalg.inv(k),
                           lcfg, mcfg, geo_scale=1.0)
    t0, a0 = snippet_loss(disps, poses, frames, k, jnp.linalg.inv(k),
                          lcfg, mcfg, geo_scale=0.0)
    geo = float(a1_["loss/geometric"])
    assert geo > 0
    np.testing.assert_allclose(float(a0["loss/geometric"]), geo, rtol=1e-6)
    np.testing.assert_allclose(
        float(t1) - float(t0), lcfg.geometric_weight * geo, rtol=1e-5
    )


def test_gauge_coupling_hinge():
    """Gauge-range prior (loss.gauge_*): exactly zero value+gradient for an
    in-band translation/depth ratio; positive with a restoring gradient on
    the pose translations when the ratio collapses below gauge_lo (the
    scale-decoupling failure, docs/SCALE_DECOUPLING.md)."""
    # n_scales=1: the gauge term reads only poses + the full-res depth,
    # so one scale pins the same contract at half the eager op count
    _, _, frames, k, mcfg = _setup_snippet(32, 32, n_scales=1)
    disps, poses = _rand_disps_poses(mcfg, frames)
    lcfg = LossConfig(gauge_weight=1.0, gauge_lo=0.005, gauge_hi=1.0)

    @jax.jit  # 6 evals of the same two programs: compile once each
    def gauge_of(p):
        loss, aux = snippet_loss(
            disps, p, frames, k, jnp.linalg.inv(k), lcfg, mcfg
        )
        return aux["loss/gauge"], aux["gauge/r"]

    @jax.jit
    def loss_of(p):
        return snippet_loss(
            disps, p, frames, k, jnp.linalg.inv(k), lcfg, mcfg
        )[0]

    # in-band: scale translations so r sits mid-band; hinge must be 0 and
    # contribute exactly nothing to the pose gradient
    _, r0 = gauge_of(poses)
    mid = poses.at[..., 3:].mul(0.07 / float(r0))
    g_mid, r_mid = gauge_of(mid)
    assert 0.005 < float(r_mid) < 1.0
    assert float(g_mid) == 0.0
    lcfg_off = LossConfig(gauge_weight=0.0)
    base = jax.jit(lambda p: snippet_loss(
        disps, p, frames, k, jnp.linalg.inv(k), lcfg_off, mcfg)[0])(mid)
    np.testing.assert_allclose(float(loss_of(mid)), float(base), rtol=1e-7)

    # collapsed: 100x below the band → positive hinge, gradient pushes the
    # translation magnitude UP (negative inner product with t)
    tiny = poses.at[..., 3:].mul(0.07 / float(r0) / 1e4)
    g_tiny, r_tiny = gauge_of(tiny)
    assert float(r_tiny) < 0.005 / 50
    assert float(g_tiny) > 1.0
    grad = jax.grad(loss_of)(tiny)
    t, gt = np.asarray(tiny[..., 3:]), np.asarray(grad[..., 3:])
    assert float((t * gt).sum()) < 0  # restoring: increase ||t||


def test_adam_mu_dtype_invalid_raises():
    # 'bf16' must not silently fall back to float32 (ADVICE r4).
    from colvo.config import ColvoConfig
    from colvo.runtime.train_step import make_optimizer

    cfg = ColvoConfig()
    cfg.train.adam_mu_dtype = "bf16"
    with pytest.raises(ValueError, match="adam_mu_dtype"):
        make_optimizer(cfg)
