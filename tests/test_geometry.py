"""Geometry unit tests (SURVEY.md §4.1): closed-form cases + torch goldens."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from colvo.geometry import (
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    se3_exp,
    se3_log,
    transformation_from_parameters,
    invert_transform,
    disp_to_depth,
    pixel_grid,
    backproject,
    project,
    bilinear_sample,
    grid_sample,
    inverse_warp,
    reproject_depth,
)
from colvo.geometry.se3 import renormalize_rotation


RNG = np.random.default_rng(0)


def rand(*shape, scale=1.0):
    return jnp.asarray(RNG.normal(size=shape, scale=scale).astype(np.float32))


# ---------------------------------------------------------------- SE(3)


def test_rodrigues_vs_scipy():
    from scipy.spatial.transform import Rotation

    aa = RNG.normal(size=(32, 3)).astype(np.float32)
    ours = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
    ref = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rodrigues_small_angle_stable():
    aa = jnp.array([[1e-9, -1e-9, 1e-10], [0.0, 0.0, 0.0]])
    r = axis_angle_to_matrix(aa)
    np.testing.assert_allclose(np.asarray(r), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-7)
    # gradient must not be NaN at zero
    g = jax.grad(lambda a: jnp.sum(axis_angle_to_matrix(a)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_log_exp_roundtrip():
    aa = rand(16, 3, scale=0.8)
    r = axis_angle_to_matrix(aa)
    np.testing.assert_allclose(np.asarray(matrix_to_axis_angle(r)), np.asarray(aa), atol=1e-4)

    xi = rand(16, 6, scale=0.5)
    t = se3_exp(xi)
    np.testing.assert_allclose(np.asarray(se3_log(t)), np.asarray(xi), atol=1e-4)


def test_se3_exp_is_rigid():
    t = se3_exp(rand(8, 6))
    r = np.asarray(t[..., :3, :3])
    np.testing.assert_allclose(r @ np.swapaxes(r, -1, -2), np.broadcast_to(np.eye(3), r.shape), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t[..., 3, :]), np.broadcast_to([0, 0, 0, 1], t.shape[:-2] + (4,)), atol=0)


def test_transformation_from_parameters_invert():
    aa = rand(4, 3, scale=0.3)
    tr = rand(4, 3)
    t_fwd = transformation_from_parameters(aa, tr, invert=False)
    t_bwd = transformation_from_parameters(aa, tr, invert=True)
    prod = np.asarray(t_fwd @ t_bwd)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-5)
    np.testing.assert_allclose(np.asarray(invert_transform(t_fwd)), np.asarray(t_bwd), atol=1e-5)


def test_renormalize_rotation():
    t = se3_exp(rand(4, 6))
    drifted = t.at[..., :3, :3].multiply(1.001)
    fixed = renormalize_rotation(drifted)
    r = np.asarray(fixed[..., :3, :3])
    np.testing.assert_allclose(r @ np.swapaxes(r, -1, -2), np.broadcast_to(np.eye(3), r.shape), atol=1e-5)


# ---------------------------------------------------------------- disp/depth


def test_disp_to_depth_range():
    disp = jnp.array([0.0, 0.5, 1.0])
    _, depth = disp_to_depth(disp, min_depth=0.1, max_depth=100.0)
    np.testing.assert_allclose(float(depth[0]), 100.0, rtol=1e-5)
    np.testing.assert_allclose(float(depth[2]), 0.1, rtol=1e-5)
    assert float(depth[1]) > 0.1 and float(depth[1]) < 100.0


# ---------------------------------------------------------------- project/backproject


def _simple_k(h, w):
    return jnp.array([[0.9 * w, 0.0, w / 2.0], [0.0, 1.2 * h, h / 2.0], [0.0, 0.0, 1.0]], dtype=jnp.float32)


def test_backproject_project_roundtrip():
    b, h, w = 2, 24, 32
    k = _simple_k(h, w)
    depth = jnp.asarray(1.0 + RNG.random((b, h, w)).astype(np.float32))
    points = backproject(depth, jnp.linalg.inv(k))
    ident = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
    pix, z = project(points, k, ident)
    grid = pixel_grid(h, w)[None, ..., :2]
    np.testing.assert_allclose(np.asarray(pix), np.broadcast_to(np.asarray(grid), (b, h, w, 2)), atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(depth), atol=1e-4)


def test_pure_z_translation_known_shift():
    # Camera moves backward (+z in cam→src means scene farther): projected
    # points move toward the principal point.
    b, h, w = 1, 32, 32
    k = _simple_k(h, w)
    depth = jnp.full((b, h, w), 2.0)
    t = transformation_from_parameters(jnp.zeros((b, 3)), jnp.array([[0.0, 0.0, 1.0]]))
    pix, z = project(backproject(depth, jnp.linalg.inv(k)), k, t)
    np.testing.assert_allclose(np.asarray(z), 3.0, atol=1e-5)
    # x' − cx = (x − cx) · (2/3)
    grid = np.asarray(pixel_grid(h, w))
    expect_x = (grid[..., 0] - 16.0) * (2.0 / 3.0) + 16.0
    np.testing.assert_allclose(np.asarray(pix[0, ..., 0]), expect_x, atol=1e-3)


# ---------------------------------------------------------------- sampling


def test_identity_warp_is_identity():
    b, h, w = 2, 16, 20
    img = jnp.asarray(RNG.random((b, h, w, 3)).astype(np.float32))
    k = _simple_k(h, w)
    depth = jnp.asarray(1.0 + RNG.random((b, h, w)).astype(np.float32))
    warped, mask = inverse_warp(img, depth, jnp.broadcast_to(jnp.eye(4), (b, 4, 4)), k, jnp.linalg.inv(k))
    np.testing.assert_allclose(np.asarray(warped), np.asarray(img), atol=1e-4)
    np.testing.assert_allclose(np.asarray(mask), 1.0)


def test_grid_sample_matches_torch():
    import torch
    import torch.nn.functional as F

    b, h, w, c = 2, 17, 23, 3
    img = RNG.random((b, h, w, c)).astype(np.float32)
    grid = (RNG.random((b, 11, 13, 2)).astype(np.float32) * 2.4 - 1.2)  # includes OOB

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_out = F.grid_sample(
        t_img, torch.from_numpy(grid), mode="bilinear", padding_mode="border", align_corners=True
    )
    ref = t_out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bilinear_sample_grad_finite():
    img = jnp.asarray(RNG.random((1, 8, 8, 1)).astype(np.float32))
    coords = jnp.asarray(RNG.random((1, 4, 4, 2)).astype(np.float32) * 7)

    def f(crd):
        return jnp.sum(bilinear_sample(img, crd) ** 2)

    g = jax.grad(f)(coords)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_reproject_depth_identity():
    b, h, w = 1, 16, 16
    k = _simple_k(h, w)
    depth = jnp.asarray(1.0 + RNG.random((b, h, w)).astype(np.float32))
    computed, sampled, mask = reproject_depth(
        depth, depth, jnp.broadcast_to(jnp.eye(4), (b, 4, 4)), k, jnp.linalg.inv(k)
    )
    np.testing.assert_allclose(np.asarray(computed), np.asarray(depth), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sampled), np.asarray(depth), atol=1e-4)
    np.testing.assert_allclose(np.asarray(mask), 1.0)
