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
