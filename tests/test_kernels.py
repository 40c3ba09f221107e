"""Pallas kernel parity tests (SURVEY.md §4.6).

On CPU CI the kernels run in interpreter mode (``force_tpu_interpret_mode``)
against the pure-XLA fallback (K3); the same parity script runs compiled on
the real chip (driven during development, see commit messages).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from colvo.geometry import bilinear_sample
from colvo.kernels.sampler import bilinear_sample_pallas


def vo_like_coords(b, h, w, seed=0, scale=2.0):
    rng = np.random.default_rng(seed)
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    x = gx[None] + rng.normal(0, scale, (b, h, w)).astype(np.float32)
    y = gy[None] + rng.normal(0, scale, (b, h, w)).astype(np.float32)
    return jnp.asarray(np.stack([x, y], axis=-1))


@pytest.mark.parametrize("h,w,c", [(64, 128, 3), (40, 160, 1)])
def test_sampler_interpret_parity(h, w, c):
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((2, h, w, c), dtype=np.float32))
    coords = vo_like_coords(2, h, w)
    ref = bilinear_sample(img, coords)
    with pltpu.force_tpu_interpret_mode():
        out = bilinear_sample_pallas(img, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow  # infrastructure for a non-default knob (batched_photo)
def test_sampler_grouped_interpret_parity():
    """Grouped sampler (one launch, coords plane i → source i // group)
    == per-plane sampler, forward AND coords gradient."""
    from colvo.kernels.sampler import bilinear_sample_pallas_grouped

    rng = np.random.default_rng(4)
    b, h, w, c, group = 2, 32, 128, 3, 3
    img = jnp.asarray(rng.random((b, h, w, c), dtype=np.float32))
    coords = vo_like_coords(b * group, h, w) + 0.3  # off cell boundaries
    ref = bilinear_sample(jnp.repeat(img, group, axis=0), coords)
    with pltpu.force_tpu_interpret_mode():
        out = bilinear_sample_pallas_grouped(img, coords, group)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def loss_ref(crd):
        return jnp.sum(jnp.cos(bilinear_sample(jnp.repeat(img, group, 0), crd)))

    def loss_grp(crd):
        return jnp.sum(jnp.cos(bilinear_sample_pallas_grouped(img, crd, group)))

    g_ref = jax.grad(loss_ref)(coords)
    with pltpu.force_tpu_interpret_mode():
        g_grp = jax.grad(loss_grp)(coords)
    np.testing.assert_allclose(np.asarray(g_grp), np.asarray(g_ref), atol=1e-4)


def test_sampler_interpret_parity_oob():
    """Out-of-bounds coords must clamp exactly like the fallback."""
    rng = np.random.default_rng(2)
    h, w = 32, 128
    img = jnp.asarray(rng.random((1, h, w, 1), dtype=np.float32))
    coords = vo_like_coords(1, h, w, scale=20.0)  # heavy OOB
    ref = bilinear_sample(img, coords)
    with pltpu.force_tpu_interpret_mode():
        out = bilinear_sample_pallas(img, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sampler_interpret_grad_parity():
    rng = np.random.default_rng(3)
    h, w = 32, 128
    img = jnp.asarray(rng.random((1, h, w, 2), dtype=np.float32))
    # keep coords off cell boundaries: subgradient choices differ there
    coords = vo_like_coords(1, h, w) + 0.3

    def loss_ref(crd):
        return jnp.sum(jnp.cos(bilinear_sample(img, crd)))

    def loss_pal(crd):
        return jnp.sum(jnp.cos(bilinear_sample_pallas(img, crd)))

    g_ref = jax.grad(loss_ref)(coords)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss_pal)(coords)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=1e-4)


def test_scatter_fullgrad_interpret_parity():
    """Full-gradient sampler (K2 scatter backward) vs XLA autodiff:
    forward + source cotangent + coords cotangent (SURVEY.md §4.6)."""
    from colvo.kernels.scatter import bilinear_sample_fullgrad

    rng = np.random.default_rng(5)
    # two fast cases: wide plane + multi-channel narrow; the odd-size
    # middle case interprets in the slow sibling (fast-loop budget)
    for h, w, c, scale in [(32, 128, 1, 2.0), (32, 40, 2, 2.0)]:
        img = jnp.asarray(rng.random((2, h, w, c), dtype=np.float32))
        coords = vo_like_coords(2, h, w, seed=int(h + w), scale=scale) + 0.3

        def loss_ref(im, crd):
            return jnp.sum(jnp.cos(3 * bilinear_sample(im, crd)))

        def loss_pal(im, crd):
            return jnp.sum(jnp.cos(3 * bilinear_sample_fullgrad(im, crd)))

        ref_v, (ref_di, ref_dc) = jax.value_and_grad(loss_ref, argnums=(0, 1))(img, coords)
        with pltpu.force_tpu_interpret_mode():
            pal_v, (pal_di, pal_dc) = jax.value_and_grad(loss_pal, argnums=(0, 1))(img, coords)
        np.testing.assert_allclose(float(pal_v), float(ref_v), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(pal_di), np.asarray(ref_di), atol=2e-5)
        np.testing.assert_allclose(np.asarray(pal_dc), np.asarray(ref_dc), atol=2e-5)


@pytest.mark.slow
def test_scatter_fullgrad_interpret_parity_odd_size():
    """Odd-sized plane (40x80) — lane padding + partial tiles."""
    from colvo.kernels.scatter import bilinear_sample_fullgrad

    rng = np.random.default_rng(5)
    h, w = 40, 80
    img = jnp.asarray(rng.random((2, h, w, 1), dtype=np.float32))
    coords = vo_like_coords(2, h, w, seed=int(h + w), scale=1.5) + 0.3

    def loss_ref(im, crd):
        return jnp.sum(jnp.cos(3 * bilinear_sample(im, crd)))

    def loss_pal(im, crd):
        return jnp.sum(jnp.cos(3 * bilinear_sample_fullgrad(im, crd)))

    ref_v, (ref_di, ref_dc) = jax.value_and_grad(loss_ref, argnums=(0, 1))(img, coords)
    with pltpu.force_tpu_interpret_mode():
        pal_v, (pal_di, pal_dc) = jax.value_and_grad(loss_pal, argnums=(0, 1))(img, coords)
    np.testing.assert_allclose(float(pal_v), float(ref_v), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pal_di), np.asarray(ref_di), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pal_dc), np.asarray(ref_dc), atol=2e-5)


def test_scatter_fullgrad_interpret_parity_oob():
    """Heavy out-of-bounds coords: border-clamped scatter targets pile up
    on the image edge; gradients must still match XLA exactly."""
    from colvo.kernels.scatter import bilinear_sample_fullgrad

    rng = np.random.default_rng(6)
    h, w = 32, 128
    img = jnp.asarray(rng.random((1, h, w, 1), dtype=np.float32))
    coords = vo_like_coords(1, h, w, seed=9, scale=20.0) + 0.3

    def loss_ref(im, crd):
        return jnp.sum(bilinear_sample(im, crd) ** 2)

    def loss_pal(im, crd):
        return jnp.sum(bilinear_sample_fullgrad(im, crd) ** 2)

    ref_di = jax.grad(loss_ref)(img, coords)
    with pltpu.force_tpu_interpret_mode():
        pal_di = jax.grad(loss_pal)(img, coords)
    np.testing.assert_allclose(np.asarray(pal_di), np.asarray(ref_di), atol=2e-5)


@pytest.mark.parametrize(
    "lcc_window",
    [pytest.param(15, marks=pytest.mark.slow), 0],  # the windowed-LCC
    # variant interprets ~3x longer; window=0 pins the kernel structure
    # in the fast loop (VERDICT r2 next #9)
)
def test_fused_loss_interpret_parity(lcc_window):
    """K1 fused warp+LCC+SSIM+L1 kernel vs the composed XLA pipeline:
    per-pixel error map + coords gradient (SURVEY.md §2.7 K1)."""
    from colvo.kernels.fused_loss import warp_photometric_pallas
    from colvo.losses.photometric import lcc_calibrate, photometric_error

    def xla_ref(src, tgt, coords):
        warped = bilinear_sample(src, coords)
        if lcc_window:
            warped = lcc_calibrate(warped, tgt, "affine", lcc_window)
        return photometric_error(warped, tgt, 0.85)

    rng = np.random.default_rng(3)
    # B=1, C=2 halves the interpreted plane count vs (2, ..., 3) with the
    # same structure coverage (multi-channel averaging + per-plane VJP);
    # fast-loop budget, VERDICT r4 next #8
    h, w, c = 32, 128, 2  # one (32,128) tile: minimum legal kernel shape
    src = jnp.asarray(rng.random((1, h, w, c), dtype=np.float32))
    tgt = jnp.asarray(rng.random((1, h, w, c), dtype=np.float32))
    coords = vo_like_coords(1, h, w, seed=8, scale=2.0) + 0.3

    def lr(crd):
        return jnp.sum(jnp.cos(4 * xla_ref(src, tgt, crd)))

    def lp(crd):
        return jnp.sum(jnp.cos(4 * warp_photometric_pallas(
            src, tgt, crd, lcc_window, 0.85)))

    rv, rg = jax.value_and_grad(lr)(coords)
    with pltpu.force_tpu_interpret_mode():
        fwd = warp_photometric_pallas(src, tgt, coords, lcc_window, 0.85)
        pv, pg = jax.value_and_grad(lp)(coords)
    np.testing.assert_allclose(
        np.asarray(fwd), np.asarray(xla_ref(src, tgt, coords)), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(pg), np.asarray(rg), atol=5e-5)


def test_scatter_fullgrad_bounded_on_garbage_coords():
    """Diverged-model robustness (runtime/loop.py throttle note): coords
    spread over the whole image drive the offset-class loops into their
    static caps (V_CAP x H_CAP) instead of an unbounded
    ~(H+tile)x(W+128) sweep that crawls the device. The capped kernel
    must stay finite and fast; exactness is only contracted for physical
    warps (spans within the caps — the other parity tests)."""
    from colvo.kernels.scatter import bilinear_sample_fullgrad

    rng = np.random.default_rng(12)
    h, w = 16, 128
    img = jnp.asarray(rng.random((1, h, w, 1), dtype=np.float32))
    # garbage: uniform over 100x the image extent, plus inf/nan spikes
    coords = jnp.asarray(
        rng.uniform(-50 * w, 50 * w, (1, h, w, 2)).astype(np.float32)
    )
    coords = coords.at[0, 0, 0].set(jnp.nan).at[0, 1, 1].set(jnp.inf)

    def loss(im, crd):
        return jnp.sum(bilinear_sample_fullgrad(im, crd) ** 2)

    with pltpu.force_tpu_interpret_mode():
        d_img = jax.grad(loss)(img, coords)
    assert d_img.shape == img.shape  # completed under caps; no wedge


@pytest.mark.slow
def test_scatter_cap_overflow_audit():
    """The overflow audit (ADVICE r2 medium) makes the scatter kernel's
    static-cap exactness contract observable: 0 dropped classes for a
    physical VO warp, nonzero for a garbage warp that exceeds the caps.
    (slow: interprets the kernel over several warp regimes)"""
    from colvo.kernels.scatter import scatter_cap_overflow

    rng = np.random.default_rng(3)
    h, w = 64, 128
    # physical warp: near-identity grid plus small smooth displacement
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    sane = np.stack([gx + 3.0 * np.sin(gy / 17.0), gy + 2.5], axis=-1)[None]
    assert int(scatter_cap_overflow(jnp.asarray(sane), (h, w))) == 0

    # garbage warp: coords spread over 100x the image extent
    bad = rng.uniform(-50 * w, 50 * w, (1, h, w, 2)).astype(np.float32)
    assert int(scatter_cap_overflow(jnp.asarray(bad), (h, w))) > 0

    # non-tile-aligned output grid: padding must not poison the spans
    assert int(scatter_cap_overflow(jnp.asarray(sane[:, : h - 7, : w - 5]),
                                    (h, w))) == 0

    # wired through the loss: aux metric appears under loss.scatter_audit
    from colvo.config import ColvoConfig
    from colvo.data import SnippetDataset, batch_iterator, render_sequence
    from colvo.models import ColVOModel

    cfg = ColvoConfig()
    cfg.model.dtype = "float32"
    cfg.model.n_scales = 1
    cfg.data.height = cfg.data.width = 32
    cfg.data.batch_size = 2
    cfg.data.augment = False
    cfg.loss.scatter_audit = True
    seq = render_sequence(n_frames=4, height=32, width=32, seed=0)
    ds = SnippetDataset([seq.frames], [seq.k], cfg.data.frame_offsets)
    batch = next(batch_iterator(ds, cfg.data, seed=0))
    model = ColVOModel(cfg.model)
    frames = jnp.asarray(batch["frames"])
    params = jax.jit(model.init)(jax.random.key(0), frames)
    from colvo.losses import snippet_loss

    disps, poses = model.apply(params, frames)
    k = jnp.asarray(batch["k"])
    _, aux = snippet_loss(disps, poses, frames, k, jnp.linalg.inv(k),
                          cfg.loss, cfg.model)
    assert "geo/scatter_overflow" in aux
    assert int(aux["geo/scatter_overflow"]) == 0  # untrained-but-sane warp
